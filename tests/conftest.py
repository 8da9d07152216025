"""Test configuration: force the CPU JAX backend with 8 virtual devices.

Tests must run anywhere (CI, dev boxes) without TPU hardware; sharding tests
use an 8-device virtual CPU mesh, standing in for an 8-chip TPU slice.
This must run before jax is imported anywhere in the test process.

Persistent-cache stability note (2026-08-19): XLA:CPU's
``LoadedExecutable.serialize()`` can SEGFAULT (rc=139, crash inside
``jax._src.compilation_cache.put_executable_and_time``) when a
persistent-cache WRITE happens late in a long-lived process — observed
3/3 at the ~150th test of a single-process full-suite run, while the
IDENTICAL programs serialize fine from small processes (verified by a
forced-write run with VCA_TEST_CACHE_MIN_COMPILE_S=0). Mitigations:
per-file xdist workers are the default (pyproject addopts) so every
cache write happens in a young process, and sub-0.5s compiles are never
written (JAX default threshold). Knobs:
  VCA_TEST_JAX_CACHE         — relocate the suite's compile cache dir
  VCA_TEST_CACHE_MIN_COMPILE_S — override the write threshold (0 forces
                                 every program into the cache; use only
                                 from small/targeted pytest runs)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Silence XLA's cpu_aot_loader feature-mismatch spam when loading persistent
# cache entries (the compile-time feature list carries prefer-no-scatter/
# gather pseudo-features the host query omits; results are verified
# bit-exact by the golden parity suites).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; jax.config wins over both.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite builds many deep-pyramid cascade
# programs (minutes of XLA:CPU compile); caching them on disk makes repeat
# runs compile-free. Safe to delete the directory at any time.
_CACHE_DIR = os.environ.get("VCA_TEST_JAX_CACHE") or os.path.join(
    os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs",
                  float(os.environ.get("VCA_TEST_CACHE_MIN_COMPILE_S", "0.5")))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
