"""Optimizer construction matching torch semantics.

Reference utils/setup_elements.py:71-82: SGD(lr, weight_decay) and
Adam(lr, weight_decay). torch couples weight decay into the gradient
(grad += wd * p) *before* the optimizer math, so decay is chained before
scale_by_adam here (optax.adamw would be decoupled — wrong parity).
"""

from __future__ import annotations

import optax


def setup_opt(optimizer: str, lr: float, wd: float = 0.0, inject: bool = False):
    """`inject=True` wraps the chain in optax.inject_hyperparams so lr/wd
    live in opt_state.hyperparams as traced leaves — stacked opt_states can
    then carry a *different* lr/wd per vmapped grid point or run
    (experiment/parallel_tune.py)."""
    if inject:
        def make(learning_rate, weight_decay):
            return _build(optimizer, learning_rate, weight_decay,
                          static_wd=False)

        return optax.inject_hyperparams(make)(learning_rate=lr,
                                              weight_decay=wd)
    return _build(optimizer, lr, wd, static_wd=True)


def _build(optimizer: str, lr, wd, static_wd: bool):
    txs = []
    if not static_wd:
        # traced wd can't be branched on; wd=0 decay is a numeric no-op
        txs.append(optax.add_decayed_weights(wd))
    elif wd:
        txs.append(optax.add_decayed_weights(wd))
    if optimizer == "SGD":
        txs.append(optax.sgd(lr))
    elif optimizer == "Adam":
        txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        txs.append(optax.scale(-lr))
    else:
        raise Exception("wrong optimizer name")
    return optax.chain(*txs)
