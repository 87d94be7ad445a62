"""Full-chain quality on a physically-motivated scene (VERDICT r3
missing #1 / next #9): harmonic sources with pitch tracks, image-source
room reverberation, spatially-correlated diffuse noise — the failure
classes flat-spectrum white-noise scenes cannot catch (the round-3 f32
fusion-NaN class appeared only on realistic scenes).

Scene provenance (all synthesized in pb_chime5_tpu/testing/rooms.py from
textbook equations — no recorded audio is available in this
environment): Allen-Berkley image-source RIRs for a 6.8 x 5.1 x 2.9 m
room at RT60 0.45 s; glottal-pulse-train talkers with random-walk pitch
tracks and per-segment formants; sinc-coherence diffuse noise at 20 dB
SNR; CHiME-5-Kinect-like 22.5 cm 4-mic bar.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pb_chime5_tpu.models.gss import GssConfig, gss_enhance
from pb_chime5_tpu.testing.rooms import make_reverberant_scene
from pb_chime5_tpu.utils import activity_time_to_frequency

pytestmark = pytest.mark.slow

FS = 16000


def _sir_db(x, only_target, only_interf):
    e_t = float(np.mean(x[only_target] ** 2))
    e_i = float(np.mean(x[only_interf] ** 2))
    return 10.0 * np.log10(e_t / max(e_i, 1e-30))


def test_full_chain_on_reverberant_harmonic_scene(rng):
    """WPE + cacGMM + MVDR-Souden(+BAN) on a reverberant 2-talker
    harmonic scene, with and without the reference's mask_mul
    postfilter (core.py:268-273).

    What is pinnable here is bounded by physics, not estimation: the
    talkers sit at/beyond the critical distance (~0.85 m for this room/
    RT60), so even ORACLE masks (from the ground-truth source images)
    through the same MVDR reach only ~+13 dB SIR — the interferer's
    energy is mostly diffuse reverb a spatial filter cannot null
    (measured: scripts_dev/diag_realistic_scene.py; oracle mask_mul
    reaches +46 dB because masking is not spatially limited).  Pins:

      * the f32 chain stays finite on harmonic + reverberant +
        correlated-noise input (the round-3 NaN class appeared only on
        realistic scenes) — the test's primary job,
      * beamformer-only improves SIR (> 1.5 dB tripwire; measured
        +2.6 dB here, +5.5 dB on the diag seed),
      * mask_mul improves > 10 dB (measured ~+15 dB across seeds).
    """
    scene = make_reverberant_scene(
        rng, num_speakers=2, duration=8.0, rt60=0.45, noise_snr_db=20.0)
    obs = scene['obs'].astype(np.float32)
    activity = scene['activity']
    (a0, b0), (a1, b1) = scene['spans']
    N = obs.shape[1]

    # exclusive regions (margin of 1000 samples away from the overlap)
    only0 = np.zeros(N, bool)
    only0[a0:a1] = True
    only1 = np.zeros(N, bool)
    only1[b0:b1] = True
    only0[max(0, a1 - 1000):] &= False
    assert only0.sum() > FS and only1.sum() > FS

    sir_raw = _sir_db(obs[0], only0, only1)
    improvements = {}
    for postfilter in (None, 'mask_mul'):
        config = GssConfig(bss_iterations=10, postfilter=postfilter)
        act_f = activity_time_to_frequency(
            activity, config.stft_size, config.stft_shift,
            stft_fading=config.stft_fading, stft_pad=True).astype(np.int8)

        x_hat, _ = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f),
                               jnp.int32(0), config=config)
        x_hat = np.asarray(x_hat)
        # the whole point of the realistic scene: the f32 chain must
        # stay finite on harmonic + reverberant + correlated-noise input
        assert np.isfinite(x_hat).all(), postfilter
        assert np.abs(x_hat).max() > 0, postfilter
        improvements[postfilter] = _sir_db(x_hat, only0, only1) - sir_raw

    print(f'\nrealistic scene: SIR raw {sir_raw:.1f} dB, improvement '
          f'bf-only {improvements[None]:.1f} dB, '
          f'mask_mul {improvements["mask_mul"]:.1f} dB')
    assert improvements[None] > 1.5, improvements
    assert improvements['mask_mul'] > 10.0, improvements


def test_rooms_physics_sanity(rng):
    """Cheap invariants of the scene generator itself (fast shapes)."""
    from pb_chime5_tpu.testing.rooms import (
        image_source_rir, harmonic_source, diffuse_noise)
    room = np.array([5.0, 4.0, 2.8])
    src = np.array([1.5, 2.0, 1.2])
    mics = np.array([[3.0, 2.0, 1.1], [3.1, 2.0, 1.1]])
    rirs = image_source_rir(room, src, mics, rt60=0.25)
    assert np.isfinite(rirs).all()
    # direct-path delay at the right sample
    d = np.linalg.norm(src - mics[0])
    peak = int(np.argmax(np.abs(rirs[0])))
    assert abs(peak - d / 343.0 * FS) <= 2, (peak, d / 343.0 * FS)
    # energy decays: the last fifth is far below the first tenth
    L = rirs.shape[1]
    e_head = np.sum(rirs[0][:L // 10] ** 2)
    e_tail = np.sum(rirs[0][-L // 5:] ** 2)
    assert e_tail < 0.05 * e_head

    s = harmonic_source(rng, 2.0)
    assert np.isfinite(s).all()
    ac = np.correlate(s[:FS], s[:FS], 'full')[FS:]
    lo, hi = FS // 300, FS // 80
    lag = int(np.argmax(ac[lo:hi])) + lo
    assert 80.0 <= FS / lag <= 300.0         # pitch in the speech range

    n = diffuse_noise(rng, mics, 1.0)
    assert n.shape == (2, FS) and np.isfinite(n).all()
    # low-frequency inter-mic coherence is high for a diffuse field
    X = np.fft.rfft(n, axis=-1)
    band = slice(1, 40)                       # < ~600 Hz
    num = np.abs(np.sum(X[0, band] * X[1, band].conj()))
    den = np.sqrt(np.sum(np.abs(X[0, band]) ** 2)
                  * np.sum(np.abs(X[1, band]) ** 2))
    assert num / den > 0.5, num / den
