"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests).

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This image pins JAX_PLATFORMS=axon through a site hook that wins over the
# env var; the config knob still wins over the hook.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (round 5): the big-program tests (full S3D
# fwd+bwd under sp/sph meshes) cost minutes of XLA:CPU compile per run on
# this 1-core box; cached reruns replay in seconds. Same cache dir the
# driver dryrun and the chip benches use (.jax_cache/, gitignored).
from coclr_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running learning-dynamics tests")
