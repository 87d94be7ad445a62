"""In-graph output trim (``GssPipeline.device_trim``).

The reference materializes the full ±context span on the host and trims
it there (core.py:500-505); at the headline config (10 s utterance +
2x15 s context) that downloads ~4x the emitted bytes per utterance.
With ``device_trim`` the pipeline slices the emitted region in-graph
(``_trim_output``: pad-then-``dynamic_slice``, a pure copy) at a static
:meth:`GssPipeline.output_bucket` length, so only ~the utterance bytes
cross the device->host boundary.  These tests pin:

  * the static planning helpers (bucketing, fallbacks to host trim),
  * BIT-identical outputs vs the host trim on every dispatch path
    (direct / session-cache, fused / fast_start), and
  * that ``warmup(trim_buckets=...)`` precompiles every trim variant
    the session loop will dispatch (zero new compiles afterwards).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pb_chime5_tpu.models import GssConfig
from pb_chime5_tpu.models.gss import GssPipeline

from tests.test_gss_pipeline import make_scene, activity_to_freq


def test_output_bucket_static():
    """Download length = emitted length rounded up to 1/8ths of the
    program bucket; None when the 'trim' would not shrink anything."""
    ob = GssPipeline.output_bucket
    assert ob(1, 8000) == 1000
    assert ob(1000, 8000) == 1000
    assert ob(1001, 8000) == 2000
    assert ob(7000, 8000) == 7000
    assert ob(7001, 8000) is None     # rounds up to the full bucket
    assert ob(8000, 8000) is None
    # non-multiple-of-8 bucket: step is ceil(bucket/8)
    assert ob(1, 8004) == 1001
    assert ob(8003, 8004) is None


def _pipe(device_trim=True, mode='fused', **cfg):
    return GssPipeline(
        GssConfig(wpe=False, bss_iterations=2, compile_mode=mode, **cfg),
        length_buckets=(8000, 16000), device_trim=device_trim)


def test_plan_trim_fallbacks():
    """_plan_trim: in-graph only when enabled, in-range, and smaller;
    otherwise gather applies the exact host slice callers used to."""
    pipe = _pipe()
    # no trim: full valid region, no kwargs
    assert pipe._plan_trim(None, 7000, 8000) == (7000, slice(None), {})
    # trim reaching past the valid samples -> host fallback
    n, sl, kw = pipe._plan_trim((6000, 2000), 7000, 8000)
    assert (n, sl, kw) == (7000, slice(6000, 8000), {})
    # trim that would not shrink the download -> host fallback
    n, sl, kw = pipe._plan_trim((0, 7900), 8000, 8000)
    assert (n, sl, kw) == (8000, slice(0, 7900), {})
    # profitable in-range trim -> static download bucket + traced start
    n, sl, kw = pipe._plan_trim((1500, 2500), 7000, 8000)
    assert (n, sl) == (2500, slice(None))
    assert kw['output_trim_samples'] == 3000
    assert int(kw['output_trim_start']) == 1500
    # disabled -> host fallback even for a profitable trim
    off = _pipe(device_trim=False)
    assert off._plan_trim((1500, 2500), 7000, 8000) == \
        (7000, slice(1500, 4000), {})


@pytest.mark.parametrize('mode', [
    'fused', pytest.param('fast_start', marks=pytest.mark.slow),
])
def test_dispatch_trim_bitwise(rng, mode):
    """Device trim == host trim == manual slice of the untrimmed
    output, bit for bit, on the direct dispatch path in both compile
    modes."""
    obs, activity, _ = make_scene(rng, seconds=0.45)       # N=7200
    trim = (1500, 2500)
    on = _pipe(True, mode)
    off = _pipe(False, mode)
    act_f = activity_to_freq(activity, on.config)
    kw = dict(start_context_frames=2, end_context_frames=2)
    full = off.gather(off.dispatch(obs, act_f, 0, **kw))
    a = on.gather(on.dispatch(obs, act_f, 0, trim=trim, **kw))
    b = off.gather(off.dispatch(obs, act_f, 0, trim=trim, **kw))
    assert a.shape == (trim[1],)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, full[trim[0]:trim[0] + trim[1]])


def test_dispatch_cached_trim_bitwise(rng):
    """Device trim through the session-cache path == the direct path,
    bit for bit — including the zeroing of cache samples past
    num_valid_samples (the window holds real audio there)."""
    obs, activity, _ = make_scene(rng, seconds=0.45, D=4)
    N = obs.shape[1]
    pipe = _pipe(True)
    N_pad = pipe.bucket_length(N)
    off0 = 640
    W = off0 + N_pad + 320
    cache = np.full((4, W), 7.7, np.float32)   # garbage everywhere else
    cache[:, off0:off0 + N] = obs
    act_f = activity_to_freq(activity, pipe.config)
    trim = (1500, 2500)
    cached = pipe.gather(pipe.dispatch_cached(
        jnp.asarray(cache), [off0], N, act_f, 0, trim=trim))
    direct = pipe.gather(pipe.dispatch(obs, act_f, 0, trim=trim))
    np.testing.assert_array_equal(cached, direct)


class _GssCompileCounter:
    """Counts XLA compilations of the GSS programs via the
    ``jax_log_compiles`` log stream (incidental one-op programs like
    ``convert_element_type`` are ignored)."""

    _NAMES = ('gss_enhance', '_gss_front', '_gss_em', '_gss_back')

    def __init__(self):
        import logging
        self.records = []

        class _H(logging.Handler):
            def emit(_self, record):
                self.records.append(record.getMessage())

        self._handler = _H()

    def __enter__(self):
        import logging
        import jax
        self._prev = jax.config.jax_log_compiles
        jax.config.update('jax_log_compiles', True)
        self._logger = logging.getLogger('jax._src.dispatch')
        self._level = self._logger.level
        self._logger.addHandler(self._handler)
        self._logger.setLevel(logging.WARNING)
        return self

    def __exit__(self, *exc):
        import jax
        jax.config.update('jax_log_compiles', self._prev)
        self._logger.removeHandler(self._handler)
        self._logger.setLevel(self._level)

    @property
    def gss_compiles(self):
        return [m for m in self.records
                if 'Finished XLA compilation' in m
                and any(n in m for n in self._NAMES)]


@pytest.mark.slow
def test_warmup_trim_buckets_zero_new_compiles(rng):
    """warmup(trim_buckets=...) must precompile the trim-variant back
    programs (Enhancer.warmup derives the pairs from the session's real
    lengths), so a warmed session dispatching device trims triggers
    zero new GSS compilations."""
    # a config no other test compiles, so in-process jit caches cannot
    # mask a missing warmup variant
    config = GssConfig(wpe=False, bss_iterations=9)
    pipe = GssPipeline(config, length_buckets=(8000,), device_trim=True)
    obs, activity, _ = make_scene(rng, seconds=0.45)
    N = obs.shape[1]
    trim = (1500, 2500)
    n_pad = pipe.bucket_length(N)
    out_pad = pipe.output_bucket(trim[1], n_pad)
    with _GssCompileCounter() as warm:
        pipe.warmup(obs.shape[0], activity.shape[0], lengths=[N],
                    parallel=False,
                    trim_buckets=[(n_pad, out_pad)])
    assert warm.gss_compiles, \
        'warmup compiled nothing (counter broken or warmup a no-op)'
    act_f = activity_to_freq(activity, config)
    with _GssCompileCounter() as run:
        trimmed = pipe.gather(pipe.dispatch(obs, act_f, 0, trim=trim))
        untrimmed = pipe.gather(pipe.dispatch(obs, act_f, 0))
    assert not run.gss_compiles, run.gss_compiles
    np.testing.assert_array_equal(
        trimmed, untrimmed[trim[0]:trim[0] + trim[1]])
