"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device sharding tests use XLA's host-platform device-count override —
the TPU-world analogue of a fake backend (SURVEY.md §4). Must be set before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# XLA:CPU compile times on this 1-core host are minutes-per-program without a
# persistent cache; repeat test runs hit the cache and drop to seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
# This jax build defaults matmuls to low (bf16) precision even on CPU;
# golden-parity tests verify exact f32 math. (The env var is not honored by
# this jax version — set the config flag directly.)
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
