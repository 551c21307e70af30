"""Loss functions as pure jnp ops, mask-aware for fixed-shape batches.

Parity targets:
  * cross_entropy — torch CrossEntropyLoss(reduction='mean') over valid rows.
  * trick-aware criterion — reference agents/base.py:93-113 (labels_trick,
    separated_softmax) re-expressed with fixed-shape class masks instead of
    dynamic column gathers.
  * kd_loss — T=2 softened KL (reference utils/kd_manager.py:6-11).
  * supcon_loss — multi-view supervised contrastive loss with logit-max
    stabilization and self-mask (reference utils/loss.py:19-96), extended with
    a validity mask so retrieval shortfalls become masked rows, not dynamic
    shapes.
  * bce_ohe — iCaRL's summed binary CE over one-hot targets
    (reference agents/icarl.py:63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _masked_mean(values, mask):
    if mask is None:
        return jnp.mean(values)
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy(logits, labels, mask=None, class_mask=None):
    """Mean CE. `class_mask` ([C] bool) restricts the softmax support."""
    if class_mask is not None:
        logits = jnp.where(class_mask[None, :], logits, NEG_INF)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return _masked_mean(nll, mask)


def labels_trick_ce(logits, labels, mask=None):
    """CE restricted to classes present in the (valid part of the) batch.

    Reference agents/base.py:96-101 remaps labels to compacted indices over
    the batch's unique label set; restricting the softmax support to exactly
    those columns is the same loss without dynamic shapes.
    """
    n_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    if mask is not None:
        onehot = onehot * mask[:, None].astype(jnp.float32)
    present = jnp.sum(onehot, axis=0) > 0
    return cross_entropy(logits, labels, mask=mask, class_mask=present)


def separated_softmax_ce(logits, labels, old_mask, new_mask, mask=None):
    """Separate log-softmax over old-task and new-task heads.

    Reference agents/base.py:102-108 concatenates log_softmax(logits[:, old])
    and log_softmax(logits[:, new]) and NLLs the remapped label; selecting the
    label's own partition's log-softmax is identical.
    """
    old_ls = jax.nn.log_softmax(jnp.where(old_mask[None, :], logits, NEG_INF), axis=-1)
    new_ls = jax.nn.log_softmax(jnp.where(new_mask[None, :], logits, NEG_INF), axis=-1)
    label_is_old = old_mask[labels]
    ls = jnp.where(label_is_old[:, None], old_ls, new_ls)
    nll = -jnp.take_along_axis(ls, labels[:, None], axis=1)[:, 0]
    return _masked_mean(nll, mask)


def kd_loss(student_logits, teacher_logits, T: float = 2.0, mask=None):
    """Softened-KL distillation (reference utils/kd_manager.py:6-11)."""
    log_s = jax.nn.log_softmax(student_logits / T, axis=1)
    p_t = jax.nn.softmax(teacher_logits / T, axis=1)
    per_row = jnp.sum(-p_t * log_s, axis=1)
    return _masked_mean(per_row, mask) * (T ** 2)


def supcon_loss(features, labels, temperature: float = 0.07, mask=None):
    """Supervised contrastive loss, contrast_mode='all'.

    features: [bsz, n_views, d] (L2-normalized), labels: [bsz],
    mask: [bsz] validity (invalid rows excluded from anchors and contrasts).
    """
    bsz, n_views, _ = features.shape
    n = bsz * n_views
    # [views*bsz, d] — view-major concat, matching torch.cat(torch.unbind(f, 1))
    contrast = jnp.concatenate([features[:, v] for v in range(n_views)], axis=0)
    tiled_labels = jnp.tile(labels, n_views)
    if mask is None:
        row_valid = jnp.ones((n,), bool)
    else:
        row_valid = jnp.tile(mask.astype(bool), n_views)

    sim = jnp.dot(contrast, contrast.T) / temperature
    # numerical stabilization (detached max, as in the reference)
    sim = sim - jax.lax.stop_gradient(jnp.max(
        jnp.where(row_valid[None, :], sim, NEG_INF), axis=1, keepdims=True))

    pos_mask = (tiled_labels[:, None] == tiled_labels[None, :]).astype(jnp.float32)
    logits_mask = (1.0 - jnp.eye(n)) * row_valid[None, :].astype(jnp.float32)
    pos_mask = pos_mask * logits_mask

    exp_sim = jnp.exp(sim) * logits_mask
    log_prob = sim - jnp.log(jnp.maximum(jnp.sum(exp_sim, axis=1, keepdims=True), 1e-30))
    mean_log_prob_pos = jnp.sum(pos_mask * log_prob, axis=1) / jnp.maximum(
        jnp.sum(pos_mask, axis=1), 1.0)

    return -_masked_mean(jnp.where(row_valid, mean_log_prob_pos, 0.0), row_valid)


def bce_ohe(logits, targets, class_mask=None, mask=None):
    """Binary CE with logits over one-hot-style targets, summed over classes.

    Reference agents/icarl.py:63 computes it over the first `all_cls_num`
    columns only; `class_mask` selects those columns here.
    """
    per_elt = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if class_mask is not None:
        per_elt = per_elt * class_mask[None, :].astype(per_elt.dtype)
    per_row = jnp.sum(per_elt, axis=1)
    return _masked_mean(per_row, mask)
