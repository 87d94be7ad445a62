"""Tracing / per-stage timing (the reference has none — SURVEY.md section
5 explicitly calls for jax.profiler traces + per-stage timing in the TPU
build)."""

import contextlib
import time

import numpy as np

__all__ = ['StageTimer', 'trace', 'device_sync']


def device_sync(tree):
    """Force completion of a jax pytree via device->host reduction.

    Note: on the experimental axon TPU backend ``block_until_ready``
    returns before execution completes and complex arrays cannot be
    transferred; reducing |x| to a scalar works everywhere.
    """
    import jax
    import jax.numpy as jnp
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, 'dtype') and hasattr(x, 'shape')]
    for leaf in leaves:
        np.asarray(jnp.sum(jnp.abs(leaf)))
    return tree


class StageTimer:
    """Accumulate wall-clock per named stage.

    >>> timer = StageTimer()
    >>> with timer('stft'):
    ...     pass
    >>> 'stft' in timer.totals()
    True
    """

    def __init__(self, sync=False):
        self._acc = {}
        self._counts = {}
        self.sync = sync

    @contextlib.contextmanager
    def __call__(self, name, result=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and result is not None:
                device_sync(result)
            dt = time.perf_counter() - start
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._counts[name] = self._counts.get(name, 0) + 1

    def totals(self):
        return dict(self._acc)

    def report(self):
        width = max((len(k) for k in self._acc), default=0)
        lines = [
            f'{k:<{width}}  {v:8.3f} s  ({self._counts[k]} calls)'
            for k, v in sorted(self._acc.items(), key=lambda kv: -kv[1])
        ]
        return '\n'.join(lines)


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace context: view the result with TensorBoard or
    xprof (``trace('/tmp/jax-trace')``)."""
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
