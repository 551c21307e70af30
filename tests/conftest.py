"""Test env: force CPU JAX with 8 virtual devices for sharding tests.

The image's sitecustomize pre-imports jax with the axon TPU plugin and
JAX_PLATFORMS=axon, so env vars set here are too late for jax's config
defaults — use jax.config.update (backends are not initialized yet at
conftest-import time). XLA_FLAGS is still read lazily at CPU-client creation.
Tests always run on the virtual CPU mesh so they are hermetic and cannot
wedge the TPU worker.
"""

import os

# scan unroll multiplies CPU compile time for every scanned task program;
# it is semantics-neutral (tests assert behavior), so pin it to 1 here.
# Must land before ocl_tpu.config is imported (it reads the env default).
os.environ["OCL_TPU_SCAN_UNROLL"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat suite runs skip the big scan compiles.
# The dir is keyed by the host CPU fingerprint: XLA:CPU AOT cache entries
# embed the compile machine's features, and loading a cache written on a
# different host silently changes codegen/fp-contraction numerics (seen as
# cpu_aot_loader feature-mismatch warnings + divergent equivalence tests).
from ocl_tpu.config import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  host_cache_dir("ocl_tpu_xla_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
