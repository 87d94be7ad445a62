"""Fused GSS pipeline: end-to-end separation on synthetic scenes."""

import numpy as np
import pytest
import jax.numpy as jnp

from pb_chime5_tpu.models import GssConfig, gss_enhance, GssPipeline
from pb_chime5_tpu.utils import activity_time_to_frequency


FS = 16000


def make_scene(rng, seconds=3.0, D=4, overlap=True):
    """Two noise-excited, amplitude-modulated sources + sensor noise.

    Broadband stochastic sources (speech-like), NOT pure tones: WPE on a
    deterministic narrowband signal is a known pathology (the filter can
    predict the signal perfectly and the iteration diverges).
    """
    N = int(seconds * FS)
    envelope = rng.uniform(0.3, 1.0, N // 800 + 1).repeat(800)[:N]
    s0 = rng.standard_normal(N) * envelope
    s1 = rng.standard_normal(N) * envelope[::-1]
    # give each source a crude spectral tilt so they are not white
    s0 = np.convolve(s0, [1.0, 0.8, 0.4], mode='same')
    s1 = np.convolve(s1, [1.0, -0.8, 0.4], mode='same')
    b0, b1 = int(0.55 * N), int(0.45 * N)
    s0[b0:] = 0                       # spk0 active in [0, 0.55)
    s1[:b1] = 0                       # spk1 active in [0.45, 1)
    # random short FIR mixing per (source, channel): strong spatial
    # diversity at every frequency (pure sample delays would make the
    # steering vectors collapse at low frequencies)
    h0 = rng.standard_normal((D, 5))
    h1 = rng.standard_normal((D, 5))
    obs = np.stack([
        np.convolve(s0, h0[d], mode='same')
        + np.convolve(s1, h1[d], mode='same')
        for d in range(D)
    ])
    obs += 0.02 * rng.standard_normal((D, N))
    activity = np.zeros((3, N), bool)
    activity[0, :b0] = True
    activity[1, b1:] = True
    activity[2, :] = True
    return obs.astype(np.float32), activity, (b0, b1)


def activity_to_freq(activity, config):
    return activity_time_to_frequency(
        activity, config.stft_size, config.stft_shift,
        stft_fading=config.stft_fading, stft_pad=True)


def sir_improvement(obs, x_hat, b0, b1, N):
    """Energy ratio target-only vs interferer-only region, in vs out."""
    def e(x, lo, hi):
        return float((np.asarray(x[..., lo:hi]) ** 2).mean())
    t_lo, t_hi = 0, b1              # only target active
    n_lo, n_hi = b0, N              # only interferer active
    sir_in = e(obs[0], t_lo, t_hi) / e(obs[0], n_lo, n_hi)
    sir_out = e(x_hat, t_lo, t_hi) / max(e(x_hat, n_lo, n_hi), 1e-12)
    return sir_out / sir_in


@pytest.mark.slow
def test_end_to_end_mvdr(rng):
    config = GssConfig(wpe=True, bss_iterations=10)
    obs, activity, (b0, b1) = make_scene(rng)
    act_f = activity_to_freq(activity, config)
    x_hat, masks = gss_enhance(
        jnp.asarray(obs), jnp.asarray(act_f, dtype=jnp.int8),
        jnp.int32(0), config=config)
    x_hat = np.asarray(x_hat)
    assert x_hat.shape == (obs.shape[1],)
    assert np.all(np.isfinite(x_hat))
    assert masks.shape[0] == 3
    assert sir_improvement(obs, x_hat, b0, b1, obs.shape[1]) > 30


@pytest.mark.slow
def test_end_to_end_gev(rng):
    config = GssConfig(wpe=False, bss_iterations=10, bf='gev_ban')
    obs, activity, (b0, b1) = make_scene(rng)
    act_f = activity_to_freq(activity, config)
    x_hat, _ = gss_enhance(
        jnp.asarray(obs), jnp.asarray(act_f, dtype=jnp.int8),
        jnp.int32(0), config=config)
    assert sir_improvement(obs, np.asarray(x_hat), b0, b1,
                           obs.shape[1]) > 30


def test_target_index_switches_speaker(rng):
    config = GssConfig(wpe=False, bss_iterations=10)
    obs, activity, (b0, b1) = make_scene(rng)
    act_f = activity_to_freq(activity, config)
    x0, _ = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f, jnp.int8),
                        jnp.int32(0), config=config)
    x1, _ = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f, jnp.int8),
                        jnp.int32(1), config=config)
    x0, x1 = np.asarray(x0), np.asarray(x1)
    N = obs.shape[1]
    # x0 keeps early region, x1 keeps late region
    assert (x0[:b1] ** 2).mean() > 10 * (x0[b0:] ** 2).mean()
    assert (x1[b0:] ** 2).mean() > 10 * (x1[:b1] ** 2).mean()


def test_context_dropping_zeroes_masks(rng):
    config = GssConfig(wpe=False, bss_iterations=3)
    obs, activity, _ = make_scene(rng, seconds=1.0)
    act_f = activity_to_freq(activity, config)
    _, masks = gss_enhance(
        jnp.asarray(obs), jnp.asarray(act_f, jnp.int8), jnp.int32(0),
        config=config, start_context_frames=jnp.int32(7),
        end_context_frames=jnp.int32(5))
    masks = np.asarray(masks)        # (K, T, F)
    assert np.all(masks[:, :7, :] == 0)
    assert np.all(masks[:, -5:, :] == 0)
    assert masks[:, 7:-5, :].sum() > 0


def test_postfilter_mask_mul(rng):
    config = GssConfig(wpe=False, bss_iterations=3, postfilter='mask_mul')
    obs, activity, _ = make_scene(rng, seconds=1.0)
    act_f = activity_to_freq(activity, config)
    x, _ = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f, jnp.int8),
                       jnp.int32(0), config=config)
    assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.slow
def test_padded_bucket_matches_exact(rng):
    """GssPipeline with length buckets == exact-length result.

    Run in float64 so the check isolates the padding/frame-mask *logic*:
    in float32 an ill-conditioned WPE solve amplifies summation-order
    noise chaotically (same with the reference's float64-only pipeline
    downcast to f32), which is orthogonal to what this test pins.
    """
    config = GssConfig(wpe=True, bss_iterations=5)
    obs, activity, _ = make_scene(rng, seconds=1.5)
    act_f = activity_to_freq(activity, config)

    exact = GssPipeline(config, dtype=np.float64)
    bucketed = GssPipeline(config, length_buckets=[FS, 2 * FS, 4 * FS],
                           dtype=np.float64)
    x_exact, _ = exact(obs, act_f, 0)
    x_bucket, _ = bucketed(obs, act_f, 0)
    assert x_bucket.shape == x_exact.shape
    scale = np.abs(x_exact).max()
    np.testing.assert_allclose(x_bucket / scale, x_exact / scale, atol=1e-6)


@pytest.mark.slow
def test_padded_bucket_f32_sane(rng):
    """float32 bucketed output stays strongly correlated with exact."""
    config = GssConfig(wpe=True, bss_iterations=5)
    obs, activity, _ = make_scene(rng, seconds=1.5)
    act_f = activity_to_freq(activity, config)
    x_exact, _ = GssPipeline(config)(obs, act_f, 0)
    x_bucket, _ = GssPipeline(config, length_buckets=[2 * FS])(
        obs, act_f, 0)
    corr = np.corrcoef(x_exact, x_bucket)[0, 1]
    assert corr > 0.99, corr


def test_lcmv_beamformer(rng):
    """LCMV suppresses the interferer (nulls its subspace)."""
    config = GssConfig(wpe=False, bss_iterations=10, bf='lcmv')
    obs, activity, (b0, b1) = make_scene(rng)
    act_f = activity_to_freq(activity, config)
    x_hat, _ = gss_enhance(
        jnp.asarray(obs), jnp.asarray(act_f, dtype=jnp.int8),
        jnp.int32(0), config=config)
    assert sir_improvement(obs, np.asarray(x_hat), b0, b1,
                           obs.shape[1]) > 10


def test_ch2_and_sum_beamformers(rng):
    obs, activity, _ = make_scene(rng, seconds=0.5)
    for bf_kind in ['ch2', 'sum']:
        config = GssConfig(wpe=False, bss_iterations=2, bf=bf_kind)
        act_f = activity_to_freq(activity, config)
        x, _ = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f, jnp.int8),
                           jnp.int32(0), config=config)
        assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.slow
def test_split_mode_matches_fused(rng):
    """compile_mode='fast_start' (three stage programs, complex staying
    on device) must match the fused program exactly."""
    from pb_chime5_tpu.models.gss import gss_enhance_split
    config = GssConfig(wpe=True, bss_iterations=5)
    obs, activity, _ = make_scene(rng)
    act_f = activity_to_freq(activity, config).astype(np.int8)
    N = obs.shape[-1]
    kw = dict(config=config, start_context_frames=jnp.int32(3),
              end_context_frames=jnp.int32(3),
              num_valid_samples=jnp.int32(N), num_output_samples=N)
    a, am = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f),
                        jnp.int32(0), **kw)
    b, bm = gss_enhance_split(jnp.asarray(obs), jnp.asarray(act_f),
                              jnp.int32(0), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(am), np.asarray(bm))


@pytest.mark.slow
def test_pipeline_warmup_both_modes():
    """GssPipeline.warmup AOT-compiles every bucket (parallel thread pool
    in fast_start mode) without executing anything."""
    from pb_chime5_tpu.models.gss import GssPipeline
    for mode in ('fused', 'fast_start'):
        pipe = GssPipeline(
            GssConfig(wpe=True, wpe_taps=2, bss_iterations=2,
                      compile_mode=mode),
            length_buckets=(8000, 16000))
        pipe.warmup(3, 2)


@pytest.mark.parametrize('bf', ['mvdrSouden_ban', 'gev_ban'])
def test_silent_target_class_stays_finite(rng, bf):
    """Target speaker fully silent in the utterance window: the EM gives
    its class no mass, the target PSD is ~0, and the beamformer runs on
    a (near-)zero target statistic.  Same empty-class family as the
    round-3 on-chip NaN (tests/test_cacgmm.py:196) but through the FULL
    fused program, covering the mask->PSD->MVDR/GEV tail.  The output
    must be finite and essentially silent relative to the mixture."""
    config = GssConfig(wpe=False, bss_iterations=4, bf=bf)
    obs, activity, (b0, b1) = make_scene(rng, seconds=1.5, D=4)
    activity[0, :] = False                # target class never active
    act_f = activity_to_freq(activity, config)
    x_hat, masks = gss_enhance(
        jnp.asarray(obs), jnp.asarray(act_f, dtype=jnp.int8),
        jnp.int32(0), config=config)
    x_hat = np.asarray(x_hat)
    assert np.all(np.isfinite(x_hat))
    # de-facto silent: the masked class carries (numerically) no energy
    assert np.sqrt((x_hat ** 2).mean()) < \
        0.1 * np.sqrt((np.asarray(obs[0]) ** 2).mean())
