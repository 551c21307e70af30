"""Optimizer construction matching torch semantics.

Reference utils/setup_elements.py:71-82: SGD(lr, weight_decay) and
Adam(lr, weight_decay). torch couples weight decay into the gradient
(grad += wd * p) *before* the optimizer math, so decay is chained before
scale_by_adam here (optax.adamw would be decoupled — wrong parity).
"""

from __future__ import annotations

import optax


def setup_opt(optimizer: str, lr: float, wd: float = 0.0):
    txs = []
    if wd:
        txs.append(optax.add_decayed_weights(wd))
    if optimizer == "SGD":
        txs.append(optax.sgd(lr))
    elif optimizer == "Adam":
        txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        txs.append(optax.scale(-lr))
    else:
        raise Exception("wrong optimizer name")
    return optax.chain(*txs)
