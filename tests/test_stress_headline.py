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


def _oracle_chain(Y, act_f, N, size, shift, iterations, iterations_post):
    """Oracle EM + MVDR+BAN + iSTFT on a pre-dereverberated Y."""
    masks = ref.cacgmm_posteriors_np(
        Y.transpose(0, 2, 1), act_f, iterations=iterations,
        iterations_post=iterations_post)                     # (F, K, T)
    target = masks[:, 0, :]
    distortion = masks.sum(axis=1) - target
    cov_x = ref.psd_np(Y, target)
    cov_n = ref.psd_np(Y, distortion)
    w, _ = ref.mvdr_souden_np(cov_x, cov_n)
    w = ref.ban_np(w, cov_n)
    X_hat = np.einsum('fd,fdt->ft', w.conj(), Y)
    return ref.istft_np(X_hat.T[None], size, shift, fading=True)[0][:N]


def test_headline_shape_production_vs_oracle(rng):
    """Three attributed measurements, one oracle WPE pass (full
    attribution history in docs/ARCHITECTURE.md round-3 ledger):

    1. WPE deviation: production WPE (f32, the f32-stability load
       wpe_regularization=1e-4) vs the float64 unregularized oracle.
       Measured 9.6% — and attributed ENTIRELY to the deliberate load,
       not precision: f64 with the same load measures the identical
       9.63%, while f32 WITHOUT the load is 93% wrong and loads of
       1e-5/1e-6 diverge (pre-hardening: NaN) at this conditioning.
       The load is the price of a *stable* f32 WPE; pinned < 0.15.
    2. EM+beamformer waveform parity at production shape, SHORT
       trajectory (2+0 iterations, identical input Y): pre-chaos, the
       production float32 EM/MVDR/BAN tracks the float64 oracle.
       Measured 0.84%; pinned < 0.03.
    3. FULL 20+1 iterations, full chain: at this scale the EM is a
       chaotic fixed-point iteration — any perturbation decorrelates
       trajectories — so the meaningful bar is the reference's own:
       separation QUALITY (its acceptance metric is downstream WER).
       Measured: oracle 19.1 dB, production 29.6 dB SIR (production
       converges to a BETTER fixed point on this scene); deviation
       0.22 reported, quality pinned (production >= oracle - 1 dB).
    """
    size, shift = 1024, 256
    taps, delay, wpe_iters = 10, 2, 3

    obs, activity, spans = make_production_scene(rng)
    D, N = obs.shape
    act_f = activity_time_to_frequency(
        activity, size, shift, stft_fading=True, stft_pad=True)
    T = act_f.shape[1]
    assert T > 4096, T                 # past the single-EM-tile cap
    assert D == 24 and act_f.shape[0] == 5

    def rel_rms(a, b):
        return float(np.linalg.norm(a - b) / np.linalg.norm(b))

    # ---- float64 NumPy oracle front (the reference equations) ----
    Obs = ref.stft_np(obs, size, shift, fading=True)         # (D, T, F)
    Y_raw = np.ascontiguousarray(Obs.transpose(2, 0, 1))     # (F, D, T)
    del Obs
    Y_o = ref.wpe_np(Y_raw, taps=taps, delay=delay,
                     iterations=wpe_iters)

    # ---- production stages (shipping GssConfig) ----
    from pb_chime5_tpu.models.gss import (
        _stft_and_mask, _wpe_stage, _em_stage, _bf_stage)
    from pb_chime5_tpu.ops.stft import istft
    import jax

    def production_front():
        config = GssConfig()

        @jax.jit
        def f(o):
            O, fm, _ = _stft_and_mask(o, None, config)
            Ow = _wpe_stage(O, config, fm)
            return Ow.real, Ow.imag

        yr, yi = f(jnp.asarray(obs, jnp.float32))
        return np.asarray(yr) + 1j * np.asarray(yi)

    def production_back(Y_in, iterations, iterations_post):
        config = GssConfig(bss_iterations=iterations,
                           bss_iterations_post=iterations_post)

        @jax.jit
        def f(yr, yi, act):
            Ow = (yr + 1j * yi).astype(jnp.complex64)
            masks = _em_stage(Ow, act, config, None)
            X_hat, _ = _bf_stage(Ow, masks, jnp.int32(0), config,
                                 0, 0, None)
            return istft(X_hat.T, size, shift, fading=True,
                         num_samples=N)

        got = np.asarray(f(jnp.asarray(Y_in.real, jnp.float32),
                           jnp.asarray(Y_in.imag, jnp.float32),
                           jnp.asarray(act_f, jnp.int8)))
        assert np.isfinite(got).all()
        return got

    # 1. WPE deviation (attributed to the deliberate 1e-4 load)
    Y_p = production_front()
    assert np.isfinite(Y_p).all()
    rms_wpe = rel_rms(Y_p, Y_o)

    # 2. EM+BF short-trajectory parity on IDENTICAL input
    want_short = _oracle_chain(Y_o, act_f, N, size, shift, 2, 0)
    got_short = production_back(Y_o, 2, 0)
    rms_emshort = rel_rms(got_short, want_short)

    # 3. full chain, quality parity
    want_full = _oracle_chain(Y_o, act_f, N, size, shift, 20, 1)
    got_full = production_back(Y_p, 20, 1)
    rms_full = rel_rms(got_full, want_full)
    sir_in = _sir(obs[0], activity, spans, N)
    sir_oracle = _sir(want_full, activity, spans, N)
    sir_prod = _sir(got_full, activity, spans, N)

    print(f'\nheadline-shape parity: rel_rms wpe={rms_wpe:.4f} '
          f'em_short={rms_emshort:.4f} full(20+1)={rms_full:.4f}  '
          f'SIR in={sir_in:.1f} dB  oracle={sir_oracle:.1f} dB  '
          f'production={sir_prod:.1f} dB')

    # Pinned thresholds (PARITY.md "Headline-scale parity"):
    assert rms_wpe < 0.15, rms_wpe
    assert rms_emshort < 0.03, rms_emshort
    assert rms_full < 0.6, rms_full           # scale/energy sanity
    assert sir_oracle - sir_in > 15.0, (sir_in, sir_oracle)
    assert sir_prod - sir_in > 15.0, (sir_in, sir_prod)
    # quality parity: production must not fall behind the oracle
    # (being better is fine — observed +10 dB on this scene)
    assert sir_prod >= sir_oracle - 1.0, (sir_prod, sir_oracle)
