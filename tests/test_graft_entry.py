"""Regression tests for the driver-facing __graft_entry__ module.

Round-1 failure mode: the driver ran ``dryrun_multichip(8)`` in a process
where the axon TPU plugin had claimed the platform, so ``jax.devices()``
returned one TPU instead of 8 virtual CPU devices
(MULTICHIP_r01.json: ``AssertionError: (4, 2, 1)``).  The entry point now
pins the CPU platform itself; this test reproduces the driver's call in a
fresh subprocess with NO platform env vars set.
"""

import os
import subprocess

import pytest
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# slow tier (~19 s fresh subprocess): the driver itself runs dryrun_multichip
# as a graded gate every round; the full lane keeps this regression test
@pytest.mark.slow
def test_dryrun_multichip_fresh_subprocess():
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    proc = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip; '
         'dryrun_multichip(8); print("DRYRUN_OK")'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert 'DRYRUN_OK' in proc.stdout


def test_entry_traces_without_compile():
    """Fast-lane tripwire for the driver's single-chip gate: entry()
    must return a jittable fn + example args whose trace (abstract eval
    only — no compile, so this stays cheap) succeeds and yields a
    finite-dtype waveform shape."""
    import jax
    import numpy as np

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
    finally:
        sys.path.remove(REPO)
    fn, example_args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *example_args)
    assert out.dtype == np.float32
    assert out.shape == (example_args[0].shape[-1],), out.shape
