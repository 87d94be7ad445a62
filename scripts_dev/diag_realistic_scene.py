"""Autopsy of the realistic-scene SIR gap (round 4).

The full-chain test measured only ~2.6 dB SIR improvement with the
default beamformer-only output on the reverberant harmonic scene, while
mask_mul reached ~20 dB.  Is 2.6 dB the physics of an 8-mic array at/
beyond the critical distance, or an estimation defect?  Bound it with
ORACLE masks (from the ground-truth per-source images) through the same
beamforming stage, and attribute:

    oracle-mask MVDR  ~ upper bound of the spatial stage on this scene
    GSS-mask MVDR     ~ what the production chain achieves
    GSS mask_mul      ~ what the mask stage itself achieves

Run: JAX_PLATFORMS=cpu python scripts_dev/diag_realistic_scene.py
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

from pb_chime5_tpu.models.gss import GssConfig, gss_enhance
from pb_chime5_tpu.ops.stft import stft, istft
from pb_chime5_tpu.ops.beamform import beamform_mvdr_souden_from_masks
from pb_chime5_tpu.testing.rooms import make_reverberant_scene
from pb_chime5_tpu.utils import activity_time_to_frequency

FS = 16000


def sir_db(x, only_t, only_i):
    e_t = float(np.mean(x[only_t] ** 2))
    e_i = float(np.mean(x[only_i] ** 2))
    return 10.0 * np.log10(e_t / max(e_i, 1e-30))


def main():
    rng = np.random.default_rng(0)   # same seed family as the test rng
    scene = make_reverberant_scene(
        rng, num_speakers=2, duration=8.0, rt60=0.45, noise_snr_db=20.0)
    obs = scene['obs'].astype(np.float32)
    images = scene['images']
    noise = scene['noise']
    activity = scene['activity']
    (a0, b0), (a1, b1) = scene['spans']
    N = obs.shape[1]
    only0 = np.zeros(N, bool); only0[a0:a1] = True
    only1 = np.zeros(N, bool); only1[b0:b1] = True
    only0[max(0, a1 - 1000):] = False

    config = GssConfig(bss_iterations=10)
    size, shift = config.stft_size, config.stft_shift

    sir_raw = sir_db(obs[0], only0, only1)
    print(f'raw ch0:            SIR {sir_raw:6.2f} dB')

    # ---- oracle masks from the true images ----
    X = np.asarray(stft(jnp.asarray(obs), size, shift,
                        fading=config.stft_fading))           # (D,T,F)
    comps = np.stack([
        np.asarray(stft(jnp.asarray(images[0].astype(np.float32)),
                        size, shift, fading=config.stft_fading)),
        np.asarray(stft(jnp.asarray(images[1].astype(np.float32)),
                        size, shift, fading=config.stft_fading)),
        np.asarray(stft(jnp.asarray(noise.astype(np.float32)),
                        size, shift, fading=config.stft_fading)),
    ])                                                        # (K,D,T,F)
    pow_k = np.mean(np.abs(comps) ** 2, axis=1)               # (K,T,F)
    oracle = (pow_k / np.maximum(pow_k.sum(0, keepdims=True), 1e-20))
    oracle = oracle.astype(np.float32)

    bf = np.asarray(beamform_mvdr_souden_from_masks(
        jnp.asarray(X), jnp.asarray(oracle[0]),
        jnp.asarray(oracle[1] + oracle[2]), ban=True))        # (T,F)
    x_orc = np.asarray(istft(jnp.asarray(bf[None]), size, shift,
                             fading=config.stft_fading))[0][:N]
    print(f'oracle-mask MVDR:   SIR {sir_db(x_orc, only0, only1):6.2f} dB')

    x_om = np.asarray(istft(jnp.asarray((X[0] * oracle[0])[None]), size,
                            shift, fading=config.stft_fading))[0][:N]
    print(f'oracle mask_mul:    SIR {sir_db(x_om, only0, only1):6.2f} dB')

    # ---- production chain, bf only and mask_mul ----
    act_f = activity_time_to_frequency(
        activity, size, shift, stft_fading=config.stft_fading,
        stft_pad=True).astype(np.int8)
    for pf in (None, 'mask_mul'):
        cfg = GssConfig(bss_iterations=10, postfilter=pf)
        x_hat, _ = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f),
                               jnp.int32(0), config=cfg)
        x_hat = np.asarray(x_hat)[:N]
        print(f'GSS pf={str(pf):9s}: SIR {sir_db(x_hat, only0, only1):6.2f}'
              f' dB  finite={bool(np.isfinite(x_hat).all())}')


if __name__ == '__main__':
    main()
