"""ocl_tpu — a TPU-native online continual learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
RaptorMai/online-continual-learning (reference layout documented in SURVEY.md).

Design stance (TPU-first, not a port):
  * The whole online step (forward/backward on the incoming batch, memory
    retrieval scoring, forward/backward on memory, optimizer update, buffer
    update) is a single pure jitted function over a TrainState pytree with
    donated state.
  * Buffer strategies are pure functions on fixed-shape arrays: masking over
    ``current_index`` replaces dynamic shapes; retrieval returns fixed-size
    slices with validity masks.
  * Agents are step-function factories selected from registries mirroring the
    reference's ``utils/name_match.py``.
  * An entire task trains in one ``lax.scan`` over its batches — one compile,
    no per-batch Python dispatch.
"""

__version__ = "0.1.0"
