"""ASER buffer strategies (KNN-SV based update & retrieve), fully on-device.

Reference utils/buffer/aser_update.py + aser_retrieve.py. The host-side
class-index caches (ClassBalancedRandomSampling) are replaced by the buffer's
device-resident class_counts plus per-class Gumbel top-k sampling; the KNN-SV
kernel runs batched over fixed shapes with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocl_tpu.buffer.retrieve import class_balanced_sample, sample_slots
from ocl_tpu.buffer.state import valid_mask, write_slots
from ocl_tpu.config import n_classes_match
from ocl_tpu.models import features_eval
from ocl_tpu.ops.knn_sv import knn_sv, masked_max, masked_mean, masked_min


def _feats(module, p, stats, x):
    return features_eval(module, p, stats, x)


def build_aser_update(agent):
    """Reference aser_update.py:22-112.

    Reservoir-fill until full; then: evaluation set = class-balanced memory
    sample + minority-class inputs, candidate set = random memory sample
    (excluding eval) + incoming batch; buffered candidates with the lowest
    summed SV are replaced by incoming items with the highest.
    """
    module = agent.module
    params_ns = agent.params
    k = int(params_ns.k)
    n_cls = n_classes_match[params_ns.data]
    n_smp_cls = int(params_ns.n_smp_cls)
    n_total_smp = int(params_ns.n_smp_cls * n_cls)
    mem_size = int(params_ns.mem_size)

    def update(p, stats, buf, x, y, rng):
        batch = x.shape[0]
        mem = buf.labels.shape[0]
        r_thr, r_eval, r_cand, r_fill = jax.random.split(rng, 4)

        cur = buf.current_index
        place_left = jnp.maximum(0, mem - cur)
        offset = jnp.minimum(place_left, batch)

        # 1) sequential fill of whatever still fits (reference :28-37)
        pos = jnp.arange(batch)
        fill_mask = pos < offset
        buf = write_slots(buf, cur + pos, x, y, fill_mask)
        buf = buf.replace(current_index=cur + offset,
                          n_seen_so_far=buf.n_seen_so_far + offset)

        # 2) SV-based replacement for the overflow part (reference :42-112)
        over_mask = pos >= offset  # items not sequentially placed
        n_over = batch - offset

        def sv_replace(buf):
            # minority-class inputs from the overflow part (aser_utils.py:119-157)
            threshold = jax.random.uniform(r_thr, ()) / n_cls
            proportion = buf.class_counts.astype(jnp.float32) / mem_size
            minority = (proportion[y] < threshold) & over_mask

            # evaluation set: class-balanced + minority inputs
            ev_x, ev_y, ev_idx, ev_mask = class_balanced_sample(buf, n_smp_cls, r_eval)
            eval_x = jnp.concatenate([ev_x, x])
            eval_y = jnp.concatenate([ev_y, y])
            eval_mask = jnp.concatenate([ev_mask, minority])

            # candidate set: random memory sample excluding eval + overflow batch
            excl = jnp.zeros(mem, bool).at[jnp.where(ev_mask, ev_idx, mem)].set(
                True, mode="drop")
            cd_idx, cd_mask = sample_slots(r_cand, valid_mask(buf) & ~excl, n_total_smp)
            cand_x = jnp.concatenate([buf.imgs[cd_idx], x])
            cand_y = jnp.concatenate([buf.labels[cd_idx], y])
            cand_mask = jnp.concatenate([cd_mask, over_mask])

            feats = _feats(module, p, stats, jnp.concatenate([eval_x, cand_x]))
            ef, cf = feats[: eval_x.shape[0]], feats[eval_x.shape[0]:]
            sv = jnp.sum(knn_sv(ef, eval_y, eval_mask, cf, cand_y, cand_mask, k),
                         axis=0)

            # segment the sv-descending order: 'large' = kept, 'small' = dropped
            order = jnp.argsort(jnp.where(cand_mask, -sv, jnp.inf))
            n_valid_buf = jnp.sum(cd_mask.astype(jnp.int32))
            n_valid_total = n_valid_buf + n_over
            rank = jnp.arange(order.shape[0])
            entry_is_cur = order >= n_total_smp
            in_large = rank < n_valid_buf
            in_small = (rank >= n_valid_buf) & (rank < n_valid_total)

            take_cur = in_large & entry_is_cur          # incoming items to insert
            drop_buf = in_small & ~entry_is_cur         # buffered slots to evict

            big = order.shape[0]
            cur_rank_pos = jnp.argsort(jnp.where(take_cur, rank, big))[:batch]
            buf_rank_pos = jnp.argsort(jnp.where(drop_buf, rank, big))[:batch]
            n_pairs = jnp.sum(take_cur.astype(jnp.int32))
            pair_mask = jnp.arange(batch) < n_pairs

            items = order[cur_rank_pos] - n_total_smp   # index into incoming batch
            slots = cd_idx[order[buf_rank_pos]]          # buffer slot to overwrite
            safe_items = jnp.clip(items, 0, batch - 1)
            new_buf = write_slots(buf, slots, x[safe_items], y[safe_items], pair_mask)
            return new_buf.replace(n_seen_so_far=buf.n_seen_so_far + n_over)

        buf = jax.lax.cond((buf.current_index >= mem) & (n_over > 0),
                           sv_replace, lambda b: b.replace(
                               n_seen_so_far=b.n_seen_so_far + n_over), buf)
        return buf, jnp.full((batch,), -1)

    return update


def build_aser_retrieve(agent):
    """Reference aser_retrieve.py:22-92: random until the buffer fills, then
    top-eps_mem_batch candidates by adversarial/cooperative SV."""
    module = agent.module
    params_ns = agent.params
    k = int(params_ns.k)
    n_smp_cls = int(params_ns.n_smp_cls)
    num_retrieve = int(params_ns.eps_mem_batch)
    mem_size = int(params_ns.mem_size)
    aser_type = params_ns.aser_type

    def retrieve(p, stats, buf, x, y, grads, rng):
        r_rand, r_cand, r_coop = jax.random.split(rng, 3)

        def random_path(_):
            from ocl_tpu.buffer.retrieve import random_retrieve

            mx, my, _, mask = random_retrieve(buf, num_retrieve, r_rand)
            return mx, my, mask, stats

        def sv_path(_):
            cand_x, cand_y, cand_idx, cand_mask = class_balanced_sample(
                buf, n_smp_cls, r_cand)
            batch_mask = jnp.ones(x.shape[0], bool)

            if aser_type == "neg_sv":
                feats = _feats(module, p, stats, jnp.concatenate([x, cand_x]))
                af, cf = feats[: x.shape[0]], feats[x.shape[0]:]
                sv_adv = knn_sv(af, y, batch_mask, cf, cand_y, cand_mask, k)
                sv = -jnp.sum(sv_adv, axis=0)
            else:
                excl = jnp.zeros(buf.labels.shape[0], bool).at[
                    jnp.where(cand_mask, cand_idx, buf.labels.shape[0])].set(
                    True, mode="drop")
                coop_x, coop_y, _, coop_mask = class_balanced_sample(
                    buf, n_smp_cls, r_coop, excl_mask=excl)
                feats = _feats(module, p, stats,
                               jnp.concatenate([x, coop_x, cand_x]))
                af = feats[: x.shape[0]]
                of = feats[x.shape[0]: x.shape[0] + coop_x.shape[0]]
                cf = feats[x.shape[0] + coop_x.shape[0]:]
                sv_adv = knn_sv(af, y, batch_mask, cf, cand_y, cand_mask, k)
                sv_coop = knn_sv(of, coop_y, coop_mask, cf, cand_y, cand_mask, k)
                if aser_type == "asv":
                    sv = masked_max(sv_coop, coop_mask) - masked_min(sv_adv, batch_mask)
                else:  # "asvm" and anything else
                    sv = masked_mean(sv_coop, coop_mask) - masked_mean(sv_adv, batch_mask)

            sv = jnp.where(cand_mask, sv, -jnp.inf)
            _, top = jax.lax.top_k(sv, num_retrieve)
            n_valid = jnp.sum(cand_mask.astype(jnp.int32))
            mask = jnp.arange(num_retrieve) < jnp.minimum(num_retrieve, n_valid)
            return cand_x[top], cand_y[top], mask, stats

        return jax.lax.cond(buf.n_seen_so_far <= mem_size, random_path, sv_path, None)

    return retrieve
