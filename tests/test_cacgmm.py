"""cacGMM EM: oracle parity, separation quality, masking semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from pb_chime5_tpu.ops import cacgmm_posteriors, CacgmmConfig
from pb_chime5_tpu.ops.cacgmm import make_initialization

from tests import reference_numpy as ref


def _two_speaker_mixture(rng, F=6, T=120, D=4):
    """Synthetic mixture: two sources with distinct spatial signatures plus
    noise, alternating activity with an overlap region."""
    steer = rng.standard_normal((2, F, D)) + 1j * rng.standard_normal(
        (2, F, D))
    sig = np.zeros((2, F, T))
    sig[0, :, :70] = rng.gamma(2.0, 1.0, (F, 70))        # spk0: frames 0-70
    sig[1, :, 50:] = rng.gamma(2.0, 1.0, (F, T - 50))    # spk1: frames 50-T
    Y = np.einsum('kfd,kft->ftd', steer,
                  np.sqrt(sig) * np.exp(1j * rng.uniform(0, 2 * np.pi,
                                                         (2, F, T))))
    Y += 0.01 * (rng.standard_normal((F, T, D))
                 + 1j * rng.standard_normal((F, T, D)))
    activity = np.zeros((3, T), bool)
    activity[0, :70] = True
    activity[1, 50:] = True
    activity[2, :] = True                                # noise class
    return Y, activity


def test_make_initialization_floor():
    act = np.array([[1, 0], [0, 1]], float)
    init = np.asarray(make_initialization(act))
    np.testing.assert_allclose(init.sum(0), 1.0, rtol=1e-6)
    assert init[0, 1] > 0  # floored, not zero
    assert init[0, 1] < 1e-9 / (1e-9 + 1)  # but tiny


def test_matches_numpy_oracle(rng):
    Y, activity = _two_speaker_mixture(rng)
    want = ref.cacgmm_posteriors_np(Y, activity, iterations=5,
                                    iterations_post=1)
    got = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), activity,
        config=CacgmmConfig(iterations=5, iterations_post=1,
                            inverse='eigh')))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_matches_oracle_post0(rng):
    Y, activity = _two_speaker_mixture(rng)
    want = ref.cacgmm_posteriors_np(Y, activity, iterations=4,
                                    iterations_post=0)
    got = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), activity,
        config=CacgmmConfig(iterations=4, iterations_post=0,
                            inverse='eigh')))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_matches_oracle_post3(rng):
    Y, activity = _two_speaker_mixture(rng)
    want = ref.cacgmm_posteriors_np(Y, activity, iterations=3,
                                    iterations_post=3)
    got = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), activity,
        config=CacgmmConfig(iterations=3, iterations_post=3,
                            inverse='eigh')))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cholesky_inverse_close_to_eigh(rng):
    """The fast Cholesky conditioning must agree with the faithful eigh
    variant on well-conditioned data (mask level)."""
    Y, activity = _two_speaker_mixture(rng)
    cfg = dict(iterations=10, iterations_post=1)
    a = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), activity,
        config=CacgmmConfig(inverse='eigh', **cfg)))
    b = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), activity,
        config=CacgmmConfig(inverse='cholesky', **cfg)))
    assert np.mean(np.abs(a - b)) < 1e-3


def test_separates_sources(rng):
    """In exclusive-activity regions the correct speaker gets the mass."""
    Y, activity = _two_speaker_mixture(rng, F=10, T=160)
    post = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), activity,
        config=CacgmmConfig(iterations=20, iterations_post=1)))
    assert post.shape == (10, 3, 160)
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-4)
    # speaker 0 dominant where only speaker 0 is loud (frames 10..45)
    assert post[:, 0, 10:45].mean() > 0.75
    # speaker 1 dominant where only speaker 1 is loud (frames 80..150)
    assert post[:, 1, 80:150].mean() > 0.75


def test_posteriors_masked_when_post0(rng):
    Y, activity = _two_speaker_mixture(rng)
    post = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), activity,
        config=CacgmmConfig(iterations=5, iterations_post=0)))
    # with iterations_post=0 the source activity mask gates the posterior
    assert np.all(post[:, 0, 70:] == 0)
    assert np.all(post[:, 1, :50] == 0)


def test_frame_mask_matches_unpadded(rng):
    Y, activity = _two_speaker_mixture(rng, F=4, T=100)
    T_pad = 128
    Y_pad = np.zeros((4, T_pad, 4), Y.dtype)
    Y_pad[:, :100] = Y
    act_pad = np.zeros((3, T_pad), bool)
    act_pad[:, :100] = activity
    act_pad[2, :] = True  # noise class "always on", like real activity
    fm = np.r_[np.ones(100, bool), np.zeros(28, bool)]
    cfg = CacgmmConfig(iterations=8, iterations_post=1)
    a = np.asarray(cacgmm_posteriors(jnp.asarray(Y), activity, config=cfg))
    b = np.asarray(cacgmm_posteriors(jnp.asarray(Y_pad), act_pad,
                                     config=cfg, frame_mask=fm))
    np.testing.assert_allclose(b[:, :, :100], a, atol=1e-5)


def test_silent_input_is_finite():
    """All-zero observations (dead segment) must not NaN.

    Regression: float32 underflow — XLA fuses chained divides into a
    reciprocal of the product of denominators, and tiny * tiny == 0.
    """
    Y = jnp.zeros((2, 10, 4), jnp.complex64)
    act = np.zeros((3, 10), bool)
    act[2] = True
    for inverse in ['cholesky', 'eigh']:
        post = np.asarray(cacgmm_posteriors(
            Y, act, config=CacgmmConfig(iterations=3, inverse=inverse)))
        assert np.all(np.isfinite(post)), inverse


def test_float32_stable(rng):
    Y, activity = _two_speaker_mixture(rng)
    post = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y, dtype=jnp.complex64), activity,
        config=CacgmmConfig(iterations=20, iterations_post=1)))
    assert post.dtype == np.float32
    assert np.all(np.isfinite(post))
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-3)


def test_pallas_em_backend_matches_xla(rng):
    """The fused Pallas E+M kernel (interpret mode off-TPU) must track the
    XLA path.  Both run float32 here (the kernel accumulates in float32);
    a few iterations keep EM's chaotic amplification of rounding bounded.
    """
    F, T, D, K = 16, 300, 4, 3
    Y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    act = rng.random((K, T)) > 0.3
    act[-1] = True
    fm = np.arange(T) < 280
    for fmv in (None, fm):
        ref = np.asarray(cacgmm_posteriors(
            jnp.asarray(Y), jnp.asarray(act),
            config=CacgmmConfig(iterations=4, iterations_post=1),
            frame_mask=fmv))
        got = np.asarray(cacgmm_posteriors(
            jnp.asarray(Y), jnp.asarray(act),
            config=CacgmmConfig(iterations=4, iterations_post=1,
                                em_backend='pallas'),
            frame_mask=fmv))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_pallas_em_long_utterance_multi_tile(rng):
    """T > the 4096-frame single-tile cap exercises the fixed-2048-tile
    path with output-block revisit accumulation (and its padding tail);
    must still track the XLA path."""
    F, T, D, K = 4, 4500, 3, 2
    Y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    act = rng.random((K, T)) > 0.3
    act[-1] = True
    ref = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), jnp.asarray(act),
        config=CacgmmConfig(iterations=3, iterations_post=1)))
    got = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), jnp.asarray(act),
        config=CacgmmConfig(iterations=3, iterations_post=1,
                            em_backend='pallas')))
    np.testing.assert_allclose(got, ref, atol=2e-3)


# slow: numerics edge case (fast lane keeps the parity/shape tests)
@pytest.mark.slow
def test_empty_activity_class_stays_finite(rng):
    """A class whose activity is all-zero inside the utterance window (a
    speaker silent in this segment — routine in real sessions) must not
    poison the EM.  Found on-chip in round 3: the accumulate-then-scale
    drivers computed cov = S * (D / max(denom, tiny)) where D/tiny
    overflows float32, so the empty class produced 0 * inf = NaN from
    iteration 2 on and EVERY class's posterior went NaN.  The
    per-frequency XLA _m_step divides per-frame and was immune."""
    F, T, D, K = 8, 200, 4, 4
    Y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    act = np.zeros((K, T), bool)
    act[0, :120] = True
    act[1, 80:] = True
    # classes 2 is empty; class 3 (noise) always on
    act[3] = True
    fm = np.arange(T) < 180
    for backend in ('xla', 'pallas'):
        for fmv in (None, fm):
            got = np.asarray(cacgmm_posteriors(
                jnp.asarray(Y), jnp.asarray(act),
                config=CacgmmConfig(iterations=5, iterations_post=1,
                                    em_backend=backend),
                frame_mask=fmv))
            assert np.isfinite(got).all(), (backend, fmv is not None)
            # the empty class must end up with (numerically) no mass
            assert got[:, 2, :].max() < 1e-3, got[:, 2, :].max()
    # and the chunked accumulation driver (bounded-HBM variant) too
    got = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), jnp.asarray(act),
        config=CacgmmConfig(iterations=5, iterations_post=1,
                            em_backend='xla', em_chunk_size=64)))
    assert np.isfinite(got).all()


def test_debug_posteriors_match_and_stats_sane(rng):
    """The debug twin (VERDICT r3 missing #3) must produce the SAME
    posteriors as the production XLA path, plus per-iteration aux
    outputs with the documented shapes and invariants."""
    from pb_chime5_tpu.ops.cacgmm import cacgmm_posteriors_debug
    Y, activity = _two_speaker_mixture(rng)
    F, T, D = Y.shape
    K = activity.shape[0]
    config = CacgmmConfig(iterations=5, iterations_post=2)
    want = np.asarray(cacgmm_posteriors(jnp.asarray(Y), activity,
                                        config=config))
    got, debug = cacgmm_posteriors_debug(jnp.asarray(Y), activity,
                                         config=config)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    I = config.iterations + config.iterations_post - 1   # M-step count
    assert np.asarray(debug['weights']).shape == (I, F, K)
    assert np.asarray(debug['logdet']).shape == (I, F, K)
    assert np.asarray(debug['condition']).shape == (I, F, K)
    assert np.asarray(debug['posterior_entropy']).shape == (I, F)
    w = np.asarray(debug['weights'])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(debug['logdet'])).all()
    # trace(B) trace(B^-1) / D^2 >= 1 for HPD B (AM-GM, small slack for
    # the inversion jitter)
    assert (np.asarray(debug['condition']) >= 0.99).all()
    ent = np.asarray(debug['posterior_entropy'])
    assert np.isfinite(ent).all() and (ent >= 0).all()
    assert (ent <= np.log(K) + 1e-5).all()


def test_debug_frame_mask_and_post0(rng):
    """Debug twin honors frame_mask and iterations_post=0 (masked final
    E-step), matching the production path bit-for-bit in shape corner
    cases."""
    from pb_chime5_tpu.ops.cacgmm import cacgmm_posteriors_debug
    Y, activity = _two_speaker_mixture(rng)
    T = Y.shape[1]
    fm = np.arange(T) < (T - 13)
    config = CacgmmConfig(iterations=3, iterations_post=0)
    want = np.asarray(cacgmm_posteriors(
        jnp.asarray(Y), activity, config=config, frame_mask=fm))
    got, debug = cacgmm_posteriors_debug(
        jnp.asarray(Y), activity, config=config, frame_mask=fm)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    assert np.asarray(debug['weights']).shape[0] == 3   # no post M-steps
