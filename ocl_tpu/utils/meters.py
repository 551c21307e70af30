"""Small host-side helpers (reference utils/utils.py:25-134)."""

from __future__ import annotations


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val, n):
        self.sum += val * n
        self.count += n

    def avg(self):
        if self.count == 0:
            return 0
        return float(self.sum) / self.count


class EarlyStopping:
    """Reference utils/utils.py:110-134."""

    def __init__(self, min_delta, patience, cumulative_delta):
        self.min_delta = min_delta
        self.patience = patience
        self.cumulative_delta = cumulative_delta
        self.counter = 0
        self.best_score = None

    def step(self, score):
        if self.best_score is None:
            self.best_score = score
        elif score <= self.best_score + self.min_delta:
            if not self.cumulative_delta and score > self.best_score:
                self.best_score = score
            self.counter += 1
            if self.counter >= self.patience:
                return True
        else:
            self.best_score = score
            self.counter = 0
        return False

    def reset(self):
        self.counter = 0
        self.best_score = None


def tree_copy(tree):
    """Device-side copy of every leaf. Needed wherever a snapshot (teacher,
    prev_params) is stored next to the live params in a donated TrainState —
    aliased leaves would be donated twice."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, tree)
