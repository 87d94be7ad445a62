"""Dev A/B: MXU precision of the WPE statistics/tail einsums.

OUTCOME — measured dead end (see the note at the top of ops/wpe.py and
docs/ARCHITECTURE.md "WPE MXU precision"): on this script's stationary
scene HIGH looked like a win (238 vs 254 ms, rel 1.3e-3), but on the
bench's envelope-modulated scene (near-silent stretches) HIGH NaNs the
WPE output, and tail-only HIGH is finite yet zero faster (HBM-bound).
Production default stays 'highest'.

Measures stft+wpe in-context time (memory: A/B in the fused program,
close timing via a tiny download) and the output deviation vs HIGHEST.

Run: python scripts_dev/bench_wpe_precision.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from pb_chime5_tpu.ops.stft import stft
import importlib
wpe_mod = importlib.import_module('pb_chime5_tpu.ops.wpe')

FS = 16000
SECONDS = 40.0
N = int(SECONDS * FS)
D = 24


def run(precision, obs):
    wpe_mod._HIGHEST = precision
    wpe_mod._wpe_impl.clear_cache()

    @jax.jit
    def f(o):
        Obs = jnp.transpose(stft(o, 1024, 256, fading=True), (2, 0, 1))
        X = wpe_mod.wpe(Obs, taps=10, delay=2, iterations=3)
        return X.real, X.imag

    xr, xi = f(obs)
    jax.block_until_ready((xr, xi))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        xr, xi = f(obs)
        # close timing with a tiny download, not the waveform
        _ = float(np.asarray(jnp.sum(jnp.abs(xr)).reshape(1))[0])
        ts.append(time.perf_counter() - t0)
    x = np.asarray(xr) + 1j * np.asarray(xi)
    return min(ts), x


def main():
    rng = np.random.default_rng(0)
    obs = jax.device_put((rng.standard_normal((D, N)) * 0.1)
                         .astype(np.float32))

    t_hi, x_hi = run(jax.lax.Precision.HIGHEST, obs)
    print(f'HIGHEST : {t_hi*1e3:7.1f} ms   (reference)')
    for name, prec in [('HIGH', jax.lax.Precision.HIGH),
                       ('DEFAULT', jax.lax.Precision.DEFAULT)]:
        t, x = run(prec, obs)
        finite = np.isfinite(x).all()
        dev = (np.linalg.norm(x - x_hi) / np.linalg.norm(x_hi)
               if finite else float('nan'))
        print(f'{name:8s}: {t*1e3:7.1f} ms   rel_rms vs HIGHEST = '
              f'{dev:.3e}   finite={finite}')
    wpe_mod._HIGHEST = jax.lax.Precision.HIGHEST
    wpe_mod._wpe_impl.clear_cache()


if __name__ == '__main__':
    main()
