"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before the first ``import jax`` anywhere in the test
process (SURVEY.md section 4: multi-chip behaviour is validated with
``xla_force_host_platform_device_count``).
"""

import os

# Tests always run on the virtual CPU mesh, even when a real TPU is
# reachable (the driver benches on the chip; tests must be hermetic).
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

# The axon TPU plugin overrides the JAX_PLATFORMS env var in this image, so
# pin the platform through the config API as well.
jax.config.update('jax_platforms', 'cpu')
# Oracle-parity tests compare against float64 NumPy references; the ops are
# dtype-polymorphic (the TPU path feeds float32/complex64).
jax.config.update('jax_enable_x64', True)

import gc

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _purge_compile_state():
    """Drop every compiled XLA:CPU executable we can reach.

    The full lane (~300 tests, one process) accumulates hundreds of
    LLVM-JIT-compiled programs; past ~215 tests the NEXT large compile
    segfaults inside ``backend_compile_and_load`` (XLA:CPU LLVM JIT) —
    deterministic per tree, every test passes in isolation.  Freeing
    loaded executables at module boundaries keeps the JIT's code/heap
    footprint bounded.  Only the package-level ``lru_cache`` factories
    pin executables across modules; per-test jits die with the test.
    """
    from pb_chime5_tpu.parallel import mesh as _mesh
    _mesh.sharded_gss_fn.cache_clear()
    _mesh.sharded_gss_cached_fn.cache_clear()
    jax.clear_caches()
    gc.collect()


def pytest_runtest_teardown(item, nextitem):
    # Module boundary (or end of session) in the FULL lane only: the
    # fast lane (-m "not slow") never accumulates enough compiled code
    # to crash, and clearing would re-pay cross-module compiles against
    # its enforced wall-clock budget (tests/test_ci_budget.py).
    markexpr = getattr(item.config.option, 'markexpr', '') or ''
    if 'not slow' in markexpr:
        return
    if nextitem is None or item.fspath != nextitem.fspath:
        _purge_compile_state()


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'fast: quick test (auto-applied to everything not '
        'marked slow/stress); the ci.sh fast lane runs -m "not slow"')
    config.addinivalue_line(
        'markers', 'slow: heavy integration/scale test (full lane only)')
    config.addinivalue_line(
        'markers', 'stress: headline-scale parity run, tens of minutes; '
        'excluded from both lanes, run via pytest -m stress')


def pytest_collection_modifyitems(config, items):
    for item in items:
        if 'slow' not in item.keywords and 'stress' not in item.keywords:
            item.add_marker(pytest.mark.fast)
        # stress tests are opt-in: skip them unless -m selects them
        if 'stress' in item.keywords and not config.option.markexpr:
            item.add_marker(pytest.mark.skip(
                reason='stress lane: run with -m stress'))
