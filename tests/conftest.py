"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device sharding tests use XLA's host-platform device-count override —
the TPU-world analogue of a fake backend (SURVEY.md §4).

Environment quirks handled here:
  * The host pins JAX_PLATFORMS=axon (remote TPU tunnel), and the axon
    plugin ALSO answers to the platform name "cpu" — `JAX_PLATFORMS=cpu`
    still lands on the tunneled TPU (slow, flaky compiles, bf16 default
    matmuls). The only reliable route to real XLA:CPU is unsetting
    JAX_PLATFORMS and setting jax_platform_name=cpu.
  * Golden-parity tests need exact f32 matmul math → highest precision.
  * A persistent compile cache keeps repeat runs fast.
"""

import os

os.environ.pop("JAX_PLATFORMS", None)  # axon plugin hijacks the name "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

if os.environ.get("DCASE_TPU_TESTS") != "1":
    # default: hermetic 8-virtual-device CPU suite. jax_platforms="cpu"
    # (not just jax_platform_name) so jax NEVER initializes the axon
    # plugin: register() pre-set jax_platforms="axon,cpu" at interpreter
    # start, and initializing axon dials the tunnel — when the tunnel is
    # down, backend init (and with it test collection) hangs forever.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
# else: run on the real TPU (enables the TPU-gated pallas/dropout tests;
# the 8-device sharding tests self-skip)
jax.config.update("jax_default_matmul_precision", "highest")
