"""Pytest bootstrap: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's graft entry;
the tests validate numerics (against the MuJoCo oracle, in float64) and
multi-chip sharding (against 8 virtual CPU devices) without TPU hardware.

Note: this environment preloads jax via sitecustomize, so env vars alone are
too late — use jax.config.update before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA:CPU compile-bound (a cold f64 H1 solve graph is ~8 min of
# LLVM time on one core). Backend opt level 0 compiles the same graphs ~33%
# faster with bit-identical test outcomes (solved cost matched to 1e-6 in
# the A/B); tests validate numerics, not codegen quality.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the suite is compile-bound (f64 CPU builds of the
# solver graphs dominate wall time); cached re-runs skip straight to numerics.
# Separate directory from the TPU cache so the TPU entries stay identifiable.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
