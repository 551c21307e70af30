from ocl_tpu.ops.pallas.distance import pairwise_sqdist  # noqa: F401
