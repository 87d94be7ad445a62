"""Dev microbench: per-stage timing of the headline pipeline on the chip.

All stages take REAL inputs and build complex in-graph (the axon backend
cannot pass complex across the jit boundary), mirroring how the fused
program runs them.

Run: PYTHONPATH=/root/.axon_site:$PYTHONPATH python scripts_dev/bench_stages.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from pb_chime5_tpu.ops.stft import stft, istft
from pb_chime5_tpu.ops.wpe import wpe
from pb_chime5_tpu.ops.cacgmm import CacgmmConfig, cacgmm_posteriors
from pb_chime5_tpu.ops import beamform as bf

FS = 16000
SECONDS = 40.0
N = int(SECONDS * FS)
D, K, F = 24, 5, 513


def bench(name, f, *args):
    out = f(*args)
    _ = float(np.asarray(jnp.sum(jnp.abs(out)).reshape(1))[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(np.asarray(jnp.sum(jnp.abs(out)).reshape(1))[0])
        ts.append(time.perf_counter() - t0)
    print(f'{name}: {min(ts)*1e3:.1f} ms')
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    obs = jax.device_put((rng.standard_normal((D, N)) * 0.1)
                         .astype(np.float32))
    from pb_chime5_tpu.ops.stft import stft_frame_count
    T = stft_frame_count(N, 1024, 256, fading=True)
    act = jax.device_put(
        (rng.random((K, T)) > 0.3).astype(np.int8))

    t_stft = bench('stft', jax.jit(
        lambda o: jnp.sum(jnp.abs(stft(o, 1024, 256, fading=True)),
                          axis=(0, 1))), obs)

    @jax.jit
    def wpe_stage(o):
        Obs = jnp.transpose(stft(o, 1024, 256, fading=True), (2, 0, 1))
        X = wpe(Obs, taps=10, delay=2, iterations=3)
        return jnp.sum(jnp.abs(X))
    t_wpe = bench('stft+wpe', wpe_stage, obs)

    @jax.jit
    def em_stage(o, a):
        Obs = jnp.transpose(stft(o, 1024, 256, fading=True), (2, 1, 0))
        masks = cacgmm_posteriors(Obs, a, config=CacgmmConfig(
            iterations=20, iterations_post=1))
        return jnp.sum(masks)
    t_em = bench('stft+em(20+1)', em_stage, obs, act)

    @jax.jit
    def bf_stage(o, a):
        Obs = jnp.transpose(stft(o, 1024, 256, fading=True), (2, 0, 1))
        tgt = a[0].astype(jnp.float32)[None, :] * jnp.ones((F, 1))
        dis = 1.0 - tgt
        cov_x = bf.psd_matrix(Obs, tgt)
        cov_n = bf.psd_matrix(Obs, dis)
        w = bf.mvdr_souden_vector(cov_x, cov_n, eps=1e-10)
        w = bf.blind_analytic_normalization(w, cov_n)
        X = bf.apply_beamforming_vector(w, Obs)
        return jnp.sum(jnp.abs(X))
    t_bf = bench('stft+mvdr_ban', bf_stage, obs, act)

    print(f'-- wpe-only ~{(t_wpe-t_stft)*1e3:.0f} ms, '
          f'em-only ~{(t_em-t_stft)*1e3:.0f} ms, '
          f'bf-only ~{(t_bf-t_stft)*1e3:.0f} ms')


if __name__ == '__main__':
    main()
