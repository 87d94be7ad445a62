"""Headline-scale parity + separation-quality stress test (VERDICT r2
next #3).

Production shape — D=24 channels (6 arrays x 4 mics), K=5 classes
(4 speakers + noise), F=513, T=4191 (> 4096, past the single-EM-tile
cap), STFT 1024/256, WPE taps=10 delay=2 iters=3, cacGMM 20+1
iterations, MVDR-Souden+BAN (reference defaults,
/root/reference/pb_chime5/core.py:574-601) — comparing the PRODUCTION
float32 program (wpe_regularization=1e-4, gauss_jordan inverses)
against the float64 NumPy oracle pipeline.

Reports and pins:
* relative waveform RMS deviation f32-production vs f64-oracle,
* SIR improvement of both (target speaker vs its strongest overlapper),
* their difference in dB.

Numbers are recorded in PARITY.md ("Headline-scale parity").  Runtime is
tens of minutes on one CPU — marked ``stress`` (kept out of ci.sh's
lanes; run explicitly with ``pytest -m stress``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pb_chime5_tpu.models.gss import GssConfig, gss_enhance
from pb_chime5_tpu.utils import activity_time_to_frequency

from tests import reference_numpy as ref

pytestmark = [pytest.mark.stress, pytest.mark.slow]

FS = 16000


def make_production_scene(rng, seconds=67.0, D=24, num_speakers=4):
    """Speech-like stochastic sources, staggered activity, random FIR
    mixing to D channels, always-on noise class.  T = 4191 frames at the
    default 1024/256 STFT for seconds=67."""
    N = int(seconds * FS)
    spans = [(0.00, 0.35), (0.25, 0.60), (0.50, 0.80), (0.70, 1.00)]
    assert num_speakers == len(spans)
    K = num_speakers + 1
    activity = np.zeros((K, N), bool)
    activity[-1] = True                      # noise class always on
    obs = 0.02 * rng.standard_normal((D, N))
    for k, (lo, hi) in enumerate(spans):
        env = rng.uniform(0.3, 1.0, N // 800 + 1).repeat(800)[:N]
        s = rng.standard_normal(N) * env
        tilt = rng.standard_normal(3) * [1.0, 0.8, 0.4]
        s = np.convolve(s, tilt, mode='same')
        a, b = int(lo * N), int(hi * N)
        s[:a] = 0.0
        s[b:] = 0.0
        activity[k, a:b] = True
        h = rng.standard_normal((D, 7))
        for d in range(D):
            obs[d] += np.convolve(s, h[d], mode='same')
    return obs.astype(np.float64), activity, spans


def _sir(x, activity, spans, N, target=0, interferer=1):
    """Energy ratio: target-exclusive region vs interferer-exclusive
    region (the target's strongest overlapper)."""
    t_hi = int(spans[interferer][0] * N)          # only target active
    i_lo = int(spans[target][1] * N)              # target silent
    i_hi = int(spans[2][0] * N)                   # spk2 not yet active
    x = np.asarray(x)
    e_t = float((x[..., :t_hi] ** 2).mean())
    e_i = float((x[..., i_lo:i_hi] ** 2).mean())
    return 10.0 * np.log10(e_t / max(e_i, 1e-300))


def test_headline_shape_production_vs_oracle(rng):
    size, shift = 1024, 256
    taps, delay, wpe_iters = 10, 2, 3
    bss_iters, bss_post = 20, 1

    obs, activity, spans = make_production_scene(rng)
    D, N = obs.shape
    act_f = activity_time_to_frequency(
        activity, size, shift, stft_fading=True, stft_pad=True)
    T = act_f.shape[1]
    assert T > 4096, T                 # past the single-EM-tile cap
    assert D == 24 and act_f.shape[0] == 5

    # ---- float64 NumPy oracle (the reference equations) ----
    Obs = ref.stft_np(obs, size, shift, fading=True)         # (D, T, F)
    Y = np.ascontiguousarray(Obs.transpose(2, 0, 1))         # (F, D, T)
    del Obs
    Y = ref.wpe_np(Y, taps=taps, delay=delay, iterations=wpe_iters)
    masks = ref.cacgmm_posteriors_np(
        Y.transpose(0, 2, 1), act_f, iterations=bss_iters,
        iterations_post=bss_post)                            # (F, K, T)
    target = masks[:, 0, :]
    distortion = masks.sum(axis=1) - target
    cov_x = ref.psd_np(Y, target)
    cov_n = ref.psd_np(Y, distortion)
    w, _ = ref.mvdr_souden_np(cov_x, cov_n)
    w = ref.ban_np(w, cov_n)
    X_hat = np.einsum('fd,fdt->ft', w.conj(), Y)
    want = ref.istft_np(X_hat.T[None], size, shift, fading=True)[0][:N]
    del Y, masks, target, distortion, cov_x, cov_n, X_hat

    # ---- float32 PRODUCTION program (default GssConfig) ----
    config = GssConfig()               # the shipping configuration
    got, _ = gss_enhance(
        jnp.asarray(obs, jnp.float32), jnp.asarray(act_f, jnp.int8),
        jnp.int32(0), config=config)
    got = np.asarray(got)[:N]

    rel_rms = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    sir_in = _sir(obs[0], activity, spans, N)
    sir_oracle = _sir(want, activity, spans, N)
    sir_prod = _sir(got, activity, spans, N)
    print(f'\nheadline-shape parity: rel_rms={rel_rms:.4f}  '
          f'SIR in={sir_in:.1f} dB  oracle={sir_oracle:.1f} dB  '
          f'production={sir_prod:.1f} dB  '
          f'delta={abs(sir_prod - sir_oracle):.2f} dB')

    # Pinned thresholds (PARITY.md "Headline-scale parity"): the f32 +
    # regularization deviation must stay perceptually irrelevant and the
    # separation must not degrade measurably.
    assert rel_rms < 0.05, rel_rms
    assert sir_oracle - sir_in > 15.0, (sir_in, sir_oracle)
    assert sir_prod - sir_in > 15.0, (sir_in, sir_prod)
    assert abs(sir_prod - sir_oracle) < 1.0, (sir_prod, sir_oracle)
