"""Whole-pipeline float64 parity: the fused TPU program vs a NumPy
pipeline composed purely of the oracle stages (waveform-level agreement,
the reference's 'bit-comparable' bar from BASELINE.md)."""

import numpy as np
import jax.numpy as jnp

from pb_chime5_tpu.models.gss import GssConfig, gss_enhance
from pb_chime5_tpu.utils import activity_time_to_frequency

from tests import reference_numpy as ref
from tests.test_gss_pipeline import make_scene


def numpy_pipeline(obs, activity, *, size, shift, taps, delay,
                   wpe_iterations, bss_iterations, bss_iterations_post,
                   ban=True):
    """The reference chain assembled from the independent oracle
    implementations (all float64)."""
    Obs = ref.stft_np(obs, size, shift, fading=True)          # (D, T, F)
    Y = Obs.transpose(2, 0, 1)                                # (F, D, T)
    if wpe_iterations:
        Y = ref.wpe_np(Y, taps=taps, delay=delay,
                       iterations=wpe_iterations)
    act_f = activity_time_to_frequency(
        activity, size, shift, stft_fading=True, stft_pad=True)
    masks = ref.cacgmm_posteriors_np(
        Y.transpose(0, 2, 1), act_f, iterations=bss_iterations,
        iterations_post=bss_iterations_post)                  # (F, K, T)
    target = masks[:, 0, :]
    distortion = masks.sum(axis=1) - target
    cov_x = ref.psd_np(Y, target)
    cov_n = ref.psd_np(Y, distortion)
    w, _ = ref.mvdr_souden_np(cov_x, cov_n)
    if ban:
        w = ref.ban_np(w, cov_n)
    X_hat = np.einsum('fd,fdt->ft', w.conj(), Y)              # (F, T)
    return ref.istft_np(X_hat.T[None], size, shift, fading=True)[0]


def test_full_chain_matches_numpy_oracle(rng):
    size, shift = 512, 128
    obs, activity, _ = make_scene(rng, seconds=1.0, D=4)
    obs = obs.astype(np.float64)

    params = dict(size=size, shift=shift, taps=4, delay=2,
                  wpe_iterations=2, bss_iterations=6,
                  bss_iterations_post=1)
    want = numpy_pipeline(obs, activity, **params)

    config = GssConfig(
        stft_size=size, stft_shift=shift,
        wpe=True, wpe_taps=4, wpe_delay=2, wpe_iterations=2,
        wpe_regularization=0.0,      # reference-exact float64 LU solve
        bss_iterations=6, bss_iterations_post=1,
        bss_inverse='eigh',          # pb_bss-faithful conditioning
        bf='mvdrSouden_ban',
    )
    act_f = activity_time_to_frequency(
        activity, size, shift, stft_fading=True, stft_pad=True)
    x_hat, _ = gss_enhance(
        jnp.asarray(obs), jnp.asarray(act_f, jnp.int8), jnp.int32(0),
        config=config)

    got = np.asarray(x_hat)
    n = min(len(got), len(want))
    scale = np.abs(want[:n]).max()
    np.testing.assert_allclose(got[:n] / scale, want[:n] / scale,
                               atol=5e-5)
