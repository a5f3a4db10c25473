"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

The real TPU chip is reserved for benchmarks; unit tests validate numerics in
float64 on CPU and sharding on a forced 8-device host platform
(SURVEY.md §4: CPU-backend multi-device simulation).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: compiles dominate test wall time here.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

# The axon TPU plugin ignores JAX_PLATFORMS and would route every op
# through the remote TPU tunnel (slow dispatch, f32-only transcendentals,
# no f64 LAPACK).  Pin the default device to the real CPU backend, which
# honors the forced 8-device host platform for sharding tests.
_cpus = jax.local_devices(backend="cpu")
jax.config.update("jax_default_device", _cpus[0])

# ---------------------------------------------------------------------------
# This environment's eager (op-by-op) dispatch is pathologically slow
# (~0.4 s/op through the axon plugin), while jitted calls are microseconds.
# Tests exercise the library through many small calls, so wrap the pure
# math-core entry points in jax.jit once here.
# ---------------------------------------------------------------------------
import inspect

import pytest

# ---------------------------------------------------------------------------
# Tier split (fast core vs slow e2e): `pytest -m "not slow"` is the
# per-commit loop; the full pyramid runs the slow tier too.  Slow modules
# are the e2e / distribution / threaded-pipeline suites whose compile +
# multi-frame walls dominate total suite time.
# ---------------------------------------------------------------------------
_SLOW_MODULES = {
    "test_scale_e2e", "test_slam_e2e", "test_vo_e2e", "test_batch_vo",
    "test_pipeline_threads", "test_slam_endpoint_mode", "test_rgbd",
    "test_dist_gba", "test_dist_ba", "test_dist_match_pgo", "test_loop",
    "test_cli", "test_ba_endpoint", "test_multihost", "test_loop_stress",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


from plslam_tpu.core import lie as _lie
from plslam_tpu.core import plucker as _plucker
from plslam_tpu.core import robust as _robust

for _mod in (_lie, _plucker, _robust):
    for _name, _fn in list(vars(_mod).items()):
        if (
            inspect.isfunction(_fn)
            and not _name.startswith("_")
            and _fn.__module__ == _mod.__name__
        ):
            setattr(_mod, _name, jax.jit(_fn))
