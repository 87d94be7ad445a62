"""WPE: oracle parity + dereverberation actually reduces reverb."""

import numpy as np
import pytest
import jax.numpy as jnp

from pb_chime5_tpu.ops import wpe, stft
from pb_chime5_tpu.ops.wpe import build_y_tilde, get_power_inverse

from tests import reference_numpy as ref


def _random_reverberant(rng, F=9, D=3, T=80):
    """Simple synthetic reverberant multichannel spectrogram."""
    source = (rng.standard_normal((F, 1, T))
              + 1j * rng.standard_normal((F, 1, T)))
    h = (rng.standard_normal((F, D, 6)) * (0.7 ** np.arange(6))
         + 1j * rng.standard_normal((F, D, 6)) * (0.7 ** np.arange(6)))
    Y = np.zeros((F, D, T), np.complex128)
    for tau in range(6):
        Y[..., tau:] += h[..., tau:tau + 1] * source[..., :T - tau]
    return Y


def test_build_y_tilde():
    Y = np.arange(12, dtype=np.complex64).reshape(1, 2, 6)
    Yt = np.asarray(build_y_tilde(jnp.asarray(Y), taps=2, delay=1))
    assert Yt.shape == (1, 4, 6)
    # tap 0 = delay 1
    np.testing.assert_array_equal(Yt[0, 0, 1:], Y[0, 0, :-1])
    np.testing.assert_array_equal(Yt[0, 0, 0], 0)
    # tap 1 = delay 2
    np.testing.assert_array_equal(Yt[0, 2, 2:], Y[0, 0, :-2])


def test_power_inverse_floor(rng):
    X = rng.standard_normal((2, 3, 10)) + 0j
    X[..., 5] = 0.0  # silent frame
    inv = np.asarray(get_power_inverse(jnp.asarray(X)))
    assert np.all(np.isfinite(inv))
    power = np.mean(np.abs(X) ** 2, axis=-2)
    expected = 1.0 / np.maximum(power, 1e-10 * power.max(-1, keepdims=True))
    np.testing.assert_allclose(inv, expected, rtol=1e-5)


def test_wpe_matches_numpy_oracle(rng):
    Y = _random_reverberant(rng)
    Xr = ref.wpe_np(Y, taps=4, delay=2, iterations=3)
    Xj = np.asarray(wpe(jnp.asarray(Y), taps=4, delay=2, iterations=3, regularization=0.0))
    np.testing.assert_allclose(Xj, Xr, atol=1e-4, rtol=1e-4)


def test_wpe_psd_context_matches_oracle(rng):
    Y = _random_reverberant(rng, F=4, D=2, T=50)
    Xr = ref.wpe_np(Y, taps=3, delay=1, iterations=2, psd_context=2)
    Xj = np.asarray(wpe(jnp.asarray(Y), taps=3, delay=1, iterations=2,
                        psd_context=2, regularization=0.0))
    np.testing.assert_allclose(Xj, Xr, atol=1e-4, rtol=1e-4)


def test_wpe_reduces_tail_energy(rng):
    """On a strongly reverberant mixture WPE should reduce the prediction
    error of late reflections: output power < input power while keeping the
    direct path (first channel early part) mostly intact."""
    Y = _random_reverberant(rng, F=16, D=4, T=200)
    X = np.asarray(wpe(jnp.asarray(Y), taps=8, delay=1, iterations=3))
    assert np.sum(np.abs(X) ** 2) < 0.9 * np.sum(np.abs(Y) ** 2)
    assert np.all(np.isfinite(X))


@pytest.mark.slow
def test_chunked_matches_unchunked(rng):
    """chunk_size statistics accumulation is numerically identical to the
    materialized path (same sums, different association only)."""
    Y = _random_reverberant(rng, F=6, D=3, T=100)
    base = np.asarray(wpe(jnp.asarray(Y), taps=4, delay=2, iterations=3))
    for chunk in (32, 50, 100, 128):
        chunked = np.asarray(wpe(jnp.asarray(Y), taps=4, delay=2,
                                 iterations=3, chunk_size=chunk))
        np.testing.assert_allclose(chunked, base, atol=1e-8)


def test_chunked_with_frame_mask(rng):
    Y = _random_reverberant(rng, F=4, D=2, T=60)
    pad = np.concatenate([Y, np.zeros((4, 2, 20), Y.dtype)], axis=-1)
    mask = np.r_[np.ones(60, bool), np.zeros(20, bool)]
    a = np.asarray(wpe(jnp.asarray(pad), taps=3, delay=1, iterations=2,
                       frame_mask=mask))
    b = np.asarray(wpe(jnp.asarray(pad), taps=3, delay=1, iterations=2,
                       frame_mask=mask, chunk_size=32))
    np.testing.assert_allclose(b, a, atol=1e-8)


def test_wpe_frame_mask_ignores_padding(rng):
    Y = _random_reverberant(rng, F=4, D=2, T=60)
    pad = np.concatenate([Y, np.zeros((4, 2, 20), Y.dtype)], axis=-1)
    mask = np.r_[np.ones(60, bool), np.zeros(20, bool)]
    X_pad = np.asarray(wpe(jnp.asarray(pad), taps=3, delay=1, iterations=2,
                           frame_mask=mask))
    X = np.asarray(wpe(jnp.asarray(Y), taps=3, delay=1, iterations=2))
    np.testing.assert_allclose(X_pad[..., :60], X, atol=1e-5)
    np.testing.assert_allclose(X_pad[..., 60:], 0.0)


def test_pallas_stats_backend_matches_xla(rng):
    """The fused Pallas statistics kernel (interpret off-TPU) must match
    the XLA einsum formulation (float32 both)."""
    from pb_chime5_tpu.ops.wpe import wpe
    F, D, T = 9, 3, 700
    Y = (rng.standard_normal((F, D, T))
         + 1j * rng.standard_normal((F, D, T))).astype(np.complex64)
    ref = np.asarray(wpe(jnp.asarray(Y), taps=4, delay=1, iterations=2,
                         stats_backend='xla'))
    got = np.asarray(wpe(jnp.asarray(Y), taps=4, delay=1, iterations=2,
                         stats_backend='pallas'))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-4)


# slow tier (~60 s): small-shape cross-backend parity stays fast-lane
# (test_real_stats_strip_splits_property, test_solve_refine_chunked_and_real_match)
@pytest.mark.slow
def test_real_stats_backend_matches_xla(rng):
    """The real-form Hermitian-blocked statistics backend computes the
    same products as the complex einsum path.  In float64 the two agree
    to ~1e-13 even after 3 iterations; in float32 the ill-conditioned
    filter solve amplifies the differing complex-dot lowering on CPU
    (on TPU both paths decompose to the same real dots)."""
    F, D, T = 5, 14, 160          # taps*D = 140 > 128: multi-strip path
    Yb = (rng.standard_normal((F, D, T))
          + 1j * rng.standard_normal((F, D, T)))
    kwargs = dict(taps=10, delay=2, iterations=3)
    a64 = np.asarray(wpe(jnp.asarray(Yb), stats_backend='xla', **kwargs))
    b64 = np.asarray(wpe(jnp.asarray(Yb), stats_backend='real', **kwargs))
    np.testing.assert_allclose(b64, a64, atol=1e-10)

    # float32: the two paths compute the same sums up to the complex-dot
    # lowering of the platform; deviation is solver-amplified roundoff.
    # The masked case keeps valid frames >> taps*D — at T_valid ~ taps*D
    # the statistics are near-singular and amplification explodes (f64
    # stays at 1e-11 there; checked while writing this test).
    F2, T2 = 5, 400
    Y = (rng.standard_normal((F2, D, T2))
         + 1j * rng.standard_normal((F2, D, T2))).astype(np.complex64)
    mask = np.r_[np.ones(T2 - 50, bool), np.zeros(50, bool)]
    for kw in (dict(), dict(frame_mask=mask), dict(psd_context=2)):
        a = np.asarray(wpe(jnp.asarray(Y), stats_backend='xla',
                           **kwargs, **kw))
        b = np.asarray(wpe(jnp.asarray(Y), stats_backend='real',
                           **kwargs, **kw))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b / scale, a / scale,
                                   rtol=0, atol=5e-4)

    # single-strip path (taps*D <= 128)
    Y2 = (rng.standard_normal((4, 3, 80))
          + 1j * rng.standard_normal((4, 3, 80))).astype(np.complex64)
    a = np.asarray(wpe(jnp.asarray(Y2), taps=4, delay=1, iterations=2,
                       stats_backend='xla'))
    b = np.asarray(wpe(jnp.asarray(Y2), taps=4, delay=1, iterations=2,
                       stats_backend='real'))
    np.testing.assert_allclose(b, a, atol=1e-5)

    # oracle parity with the real backend directly (float64, reg 0)
    Yr = _random_reverberant(rng)
    Xr = ref.wpe_np(Yr, taps=4, delay=2, iterations=3)
    Xj = np.asarray(wpe(jnp.asarray(Yr), taps=4, delay=2, iterations=3,
                        regularization=0.0, stats_backend='real'))
    np.testing.assert_allclose(Xj, Xr, atol=1e-4, rtol=1e-4)


# slow tier (~40 s): chunked-vs-unchunked at small shape is covered fast-lane
# by test_solve_refine_chunked_and_real_match
@pytest.mark.slow
def test_real_stats_chunked_matches_unchunked(rng):
    """Chunked real-form statistics: same strip-block sums accumulated
    per chunk (float64: reassociation only)."""
    F, D, T = 5, 14, 150
    Y = (rng.standard_normal((F, D, T))
         + 1j * rng.standard_normal((F, D, T)))
    kwargs = dict(taps=10, delay=2, iterations=3, stats_backend='real')
    base = np.asarray(wpe(jnp.asarray(Y), **kwargs))
    for chunk in (32, 150, 160):
        c = np.asarray(wpe(jnp.asarray(Y), chunk_size=chunk, **kwargs))
        np.testing.assert_allclose(c, base, atol=1e-8)
    # chunked real vs chunked xla, and with a frame mask
    mask = np.r_[np.ones(T - 20, bool), np.zeros(20, bool)]
    a = np.asarray(wpe(jnp.asarray(Y), taps=10, delay=2, iterations=2,
                       frame_mask=mask, chunk_size=32,
                       stats_backend='xla'))
    b = np.asarray(wpe(jnp.asarray(Y), taps=10, delay=2, iterations=2,
                       frame_mask=mask, chunk_size=32,
                       stats_backend='real'))
    np.testing.assert_allclose(b, a, atol=1e-8)


def test_precision_default_pinned_highest(rng):
    """Regression guard for the round-3 measured dead end (see
    docs/ARCHITECTURE.md "WPE MXU precision"): Precision.HIGH statistics
    NaN on realistic scenes with near-silent stretches, so the
    production default MUST stay 'highest' at both API levels.  The knob
    itself must keep accepting every documented value (numerics are
    identical off-TPU, where all precisions lower to the same f32 dots).
    """
    from pb_chime5_tpu.models.gss import GssConfig
    import inspect
    from pb_chime5_tpu.ops import wpe as wpe_fn

    assert GssConfig().wpe_precision == 'highest'
    assert inspect.signature(wpe_fn).parameters['precision'].default \
        == 'highest'

    Y = _random_reverberant(rng, F=4, D=2, T=50)
    base = np.asarray(wpe(jnp.asarray(Y), taps=3, delay=1, iterations=2))
    for prec in ('high', 'default'):
        got = np.asarray(wpe(jnp.asarray(Y), taps=3, delay=1, iterations=2,
                             precision=prec))
        np.testing.assert_allclose(got, base, atol=1e-6)


@pytest.mark.slow
def test_real_stats_strip_splits_property(rng):
    """Property sweep of the tap-group strip decomposition: for random
    (taps, D, T) — including strip boundaries just above/below the
    128-lane block and taps not divisible by the per-strip count — the
    real-form statistics backend must match the complex path in float64
    (same products, reassociation only)."""
    from pb_chime5_tpu.ops.wpe import _tap_groups
    cases = [
        (10, 13, 90),    # 130 rows: strips of 9+1 taps
        (11, 12, 80),    # 132 rows: 10+1
        (4, 32, 70),     # 128 rows exactly: single strip
        (5, 32, 70),     # 160 rows: 4+1 taps
        (3, 43, 60),     # 129 rows: 2+1
        (7, 2, 50),      # tiny D: one strip
        (2, 129, 40),    # D > lane: degenerate per=1 strips
    ]
    for taps, D, T in cases:
        groups = _tap_groups(taps, D)
        assert sum(len(g) for g in groups) == taps, (taps, D, groups)
        assert [t for g in groups for t in g] == list(range(taps))
        Y = (rng.standard_normal((3, D, T))
             + 1j * rng.standard_normal((3, D, T)))
        a = np.asarray(wpe(jnp.asarray(Y), taps=taps, delay=1,
                           iterations=2, stats_backend='xla'))
        b = np.asarray(wpe(jnp.asarray(Y), taps=taps, delay=1,
                           iterations=2, stats_backend='real'))
        np.testing.assert_allclose(b, a, atol=1e-9,
                                   err_msg=str((taps, D, T)))


def test_solve_refine_cancels_regularization_bias(rng):
    """Iterative refinement on the filter solve (VERDICT r3 next #5):
    at the production load (1e-4), refine=1 must bring the WPE output
    much closer to the UNREGULARIZED oracle than refine=0 — each
    refinement step contracts the load bias by ~load/(load + sigma_min)
    (measured here: 3.1e-3 -> 2.4e-4 -> 2.1e-5 for refine 0/1/2)."""
    Y = _random_reverberant(rng, F=5, D=3, T=120)
    want = ref.wpe_np(Y, taps=4, delay=1, iterations=2)   # unregularized

    def dev(refine):
        got = np.asarray(wpe(jnp.asarray(Y), taps=4, delay=1,
                             iterations=2, regularization=1e-4,
                             solve_refine=refine))
        assert np.isfinite(got).all()
        return float(np.linalg.norm(got - want) / np.linalg.norm(want))

    d0, d1, d2 = dev(0), dev(1), dev(2)
    assert d1 < d0 / 5, (d0, d1)        # first-order bias cancelled
    assert d2 < d1, (d1, d2)            # further steps keep contracting


def test_solve_refine_chunked_and_real_match(rng):
    """solve_refine flows through all statistics backends/chunking and
    they agree with each other."""
    Y = _random_reverberant(rng, F=4, D=2, T=90)
    kw = dict(taps=3, delay=1, iterations=2, regularization=1e-4,
              solve_refine=1)
    base = np.asarray(wpe(jnp.asarray(Y), stats_backend='xla', **kw))
    real = np.asarray(wpe(jnp.asarray(Y), stats_backend='real', **kw))
    chunked = np.asarray(wpe(jnp.asarray(Y), chunk_size=32, **kw))
    np.testing.assert_allclose(real, base, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(chunked, base, rtol=1e-6, atol=1e-8)
