"""Distribution layer: device mesh, data-parallel steps, sharded evaluation.

The reference is strictly single-process/single-GPU (SURVEY.md §2.9); this
layer is a new first-class TPU-native component: a jax.sharding.Mesh with
XLA-partitioned (pjit) steps — data-parallel batch fan-out for evaluation and
offline/GDumb retraining, a slot-sharded memory bank for retrieval scoring,
and one-run-per-device parallelism for multi-run experiments and tuning grids.
"""

from ocl_tpu.parallel.mesh import get_mesh, replicated, shard_batch  # noqa: F401
