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
from pb_chime5_tpu.testing.metrics import stoi
from pb_chime5_tpu.testing.rooms import make_reverberant_scene
from pb_chime5_tpu.utils import activity_time_to_frequency

pytestmark = pytest.mark.slow

FS = 16000


def _sir_db(x, only_target, only_interf):
    e_t = float(np.mean(x[only_target] ** 2))
    e_i = float(np.mean(x[only_interf] ** 2))
    return 10.0 * np.log10(e_t / max(e_i, 1e-30))


def _chain_improvements(seed):
    """Run the full chain (WPE + cacGMM + MVDR-Souden (+BAN)) on the
    scene drawn from ``seed`` for postfilter in (None, 'mask_mul') and
    return BOTH quality axes:

    ``sir``   postfilter -> SIR improvement (dB) over raw ch0,
    ``stoi``  ``{raw,bf,mm}_{span,ovl}``: STOI of raw ch0 / bf-only /
              mask_mul against the target's reverberant image at mic 0
              (scene['images'][0, 0]) over the full target span and over
              the two-talker overlap region.

    Finiteness / non-silence pinned per run (the round-3 f32 fusion-NaN
    class appeared only on realistic scenes — the primary job of this
    file)."""
    rng = np.random.default_rng(seed)
    scene = make_reverberant_scene(
        rng, num_speakers=2, duration=8.0, rt60=0.45, noise_snr_db=20.0)
    obs = scene['obs'].astype(np.float32)
    activity = scene['activity']
    (a0, a1), (b0, b1) = scene['spans']
    N = obs.shape[1]

    # exclusive regions (margin of 1000 samples away from the overlap):
    # target-only = [target start, interferer start - margin),
    # interferer-only = [target end, interferer end)
    only0 = np.zeros(N, bool)
    only0[a0:max(0, b0 - 1000)] = True
    only1 = np.zeros(N, bool)
    only1[a1:b1] = True
    assert only0.sum() > FS and only1.sum() > FS

    ref = scene['images'][0, 0]            # target reverberant image
    span = slice(a0, a1)
    lo, hi = max(a0, b0), min(a1, b1)      # two-talker overlap
    assert hi - lo > FS, (seed, hi - lo)
    ovl = slice(lo, hi)

    sir_raw = _sir_db(obs[0], only0, only1)
    improvements = {}
    st = {'raw_span': stoi(ref[span], obs[0][span]),
          'raw_ovl': stoi(ref[ovl], obs[0][ovl])}
    for postfilter in (None, 'mask_mul'):
        config = GssConfig(bss_iterations=10, postfilter=postfilter)
        act_f = activity_time_to_frequency(
            activity, config.stft_size, config.stft_shift,
            stft_fading=config.stft_fading, stft_pad=True).astype(np.int8)

        x_hat, _ = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f),
                               jnp.int32(0), config=config)
        x_hat = np.asarray(x_hat)
        assert np.isfinite(x_hat).all(), (seed, postfilter)
        assert np.abs(x_hat).max() > 0, (seed, postfilter)
        improvements[postfilter] = _sir_db(x_hat, only0, only1) - sir_raw
        tag = 'bf' if postfilter is None else 'mm'
        st[f'{tag}_span'] = stoi(ref[span], x_hat[span])
        st[f'{tag}_ovl'] = stoi(ref[ovl], x_hat[ovl])
    return {'sir': improvements, 'stoi': st}


_RESULTS = {}


def _results(seed):
    """Per-seed chain run, shared between the SIR and STOI gates (one
    enhancement pass per (seed, postfilter) for the whole module)."""
    if seed not in _RESULTS:
        _RESULTS[seed] = _chain_improvements(seed)
    return _RESULTS[seed]


def test_full_chain_on_reverberant_harmonic_scene():
    """Full-chain quality gate, pinned as a MEDIAN over three scene
    seeds — single-seed absolute pins are not robust here, for two
    measured reasons (round-5 root cause of the round-4 red gate):

    1. The per-frequency cacGMM EM is trajectory-chaotic on an 8 s
       scene: a rounding-level change of its input (the round-4 WPE
       P-fold changed dot accumulation order only — ops/wpe.py
       ``_real_form_stats``) moved single seeds by -7/+5 dB while the
       8-seed MEDIAN moved < 1.2 dB.  Measured mask_mul improvement
       distribution over seeds 0-7 on this machine (CPU, x64 scope):

           with P-fold (HEAD):  7.4 23.0 19.5 20.5 -1.8 19.2 25.2 32.0
           pre-fold (dffc294): 14.5 18.0 23.0 19.8 -6.9 17.9 22.2 29.4
           medians: +20.0 / +18.9 dB

    2. Talker angles are drawn uniform(0, 2pi), so some seeds are
       spatially DEGENERATE: on seed 4 even ORACLE masks through the
       same MVDR gain only +3.8 dB (talkers at nearly the same bearing)
       while oracle mask_mul reaches +44 dB — GSS, a spatial method,
       legitimately fails there, exactly as the reference would
       (/root/reference/pb_chime5/core.py:514-571 runs the same
       cacGMM).  A median over seeds tolerates such draws; a min or a
       single seed cannot.

    Pins (median over seeds 0, 1, 2 — seeds 1 and 2 are stable at
    +18..23 dB under BOTH dot formulations, so the median holds even if
    the bimodal seed 0 collapses entirely):

      * every run finite and non-silent (per-seed, the primary job),
      * median bf-only improvement > 1.5 dB
        (measured: +7.6 / +6.8 dB fold / pre-fold),
      * median mask_mul improvement > 10 dB
        (measured: +19.5 / +18.0 dB fold / pre-fold).
    """
    per_seed = {seed: _results(seed)['sir'] for seed in (0, 1, 2)}
    med_bf = float(np.median([d[None] for d in per_seed.values()]))
    med_mm = float(np.median([d['mask_mul'] for d in per_seed.values()]))
    print(f'\nrealistic scenes {sorted(per_seed)}: '
          f'bf-only {[round(d[None], 1) for d in per_seed.values()]} '
          f'(median {med_bf:.1f} dB), '
          f'mask_mul {[round(d["mask_mul"], 1) for d in per_seed.values()]} '
          f'(median {med_mm:.1f} dB)')
    assert med_bf > 1.5, per_seed
    assert med_mm > 10.0, per_seed


def test_stoi_on_reverberant_harmonic_scene():
    """Intelligibility gate (VERDICT r4 #7): SIR is an energy ratio and
    cannot see musical-noise artifacts from aggressive masks — the
    reference keeps a mask postfilter exactly to trade those
    (/root/reference/pb_chime5/core.py:268-273).  STOI
    (testing/metrics.py) against the TARGET's reverberant image at
    mic 0, pinned the robust way (median over the same 3 scene seeds as
    the SIR gate; runs are shared via :func:`_results`).

    Measured distribution over seeds 0-7 on this machine
    (scripts_dev/diag_stoi_scene.py, CPU):

        full target span: raw median 0.640, bf 0.574, mm 0.580 —
          enhanced sits slightly BELOW raw here because most of the span
          is interference-free and the reference is the REVERBERANT
          image: WPE's dereverberation + beamforming register as
          reference mismatch (by design; see the script's docstring);
        mm_span - bf_span: median +0.005, per-seed -0.021..+0.027 —
          the mask postfilter does NOT erode intelligibility;
        two-talker overlap region: bf - raw median +0.052,
          mm - raw median +0.074 (per-seed -0.14..+0.11; negatives are
          the spatially-degenerate draws, same mechanism as the SIR
          gate's seed 4) — where interference exists, enhancement WINS
          the intelligibility it exists to win.

    Pins (median over seeds 0, 1, 2; measured values in parens):

      * median mask_mul STOI in the overlap > 0.5        (0.750)
      * median (mask_mul - raw) in the overlap > 0.02    (+0.070)
      * median (mask_mul - bf) over the full span > -0.05 (+0.000)
        — the musical-noise tripwire.
    """
    st = {seed: _results(seed)['stoi'] for seed in (0, 1, 2)}
    med = {k: float(np.median([st[s][k] for s in st]))
           for k in st[0]}
    d_ovl = float(np.median([st[s]['mm_ovl'] - st[s]['raw_ovl']
                             for s in st]))
    d_span = float(np.median([st[s]['mm_span'] - st[s]['bf_span']
                              for s in st]))
    print(f'\nstoi medians {med}; mm-raw overlap {d_ovl:+.3f}, '
          f'mm-bf span {d_span:+.3f}')
    assert med['mm_ovl'] > 0.5, st
    assert d_ovl > 0.02, st
    assert d_span > -0.05, st


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
