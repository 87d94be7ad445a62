"""Dev A/B: real-form Hermitian-blocked WPE statistics vs the complex
einsum path, at the headline shape.

Measures stft+wpe(3) in-context time (close timing via a tiny download)
and the output deviation, on BOTH a stationary scene and the bench's
envelope-modulated scene (memory: standalone wins can reverse on
realistic scenes — the round-3 precision dead end changed sign there).

Run: python scripts_dev/bench_wpe_stats_form.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from pathlib import Path
_cache = Path(__file__).resolve().parent.parent / '.jax_cache'
_cache.mkdir(exist_ok=True)
jax.config.update('jax_compilation_cache_dir', str(_cache))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

from pb_chime5_tpu.ops.stft import stft
from pb_chime5_tpu.ops.wpe import wpe

FS = 16000
SECONDS = 40.0
N = int(SECONDS * FS)
D = 24


def run(backend, obs):
    @jax.jit
    def f(o):
        Obs = jnp.transpose(stft(o, 1024, 256, fading=True), (2, 0, 1))
        X = wpe(Obs, taps=10, delay=2, iterations=3,
                stats_backend=backend)
        return X.real, X.imag

    xr, xi = f(obs)
    jax.block_until_ready((xr, xi))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        xr, xi = f(obs)
        _ = float(np.asarray(jnp.sum(jnp.abs(xr)).reshape(1))[0])
        ts.append(time.perf_counter() - t0)
    x = np.asarray(xr) + 1j * np.asarray(xi)
    return sorted(ts)[len(ts) // 2], x


def main():
    rng = np.random.default_rng(0)
    flat = (rng.standard_normal((D, N)) * 0.1).astype(np.float32)
    envelope = np.abs(rng.standard_normal(N // 800 + 1)).repeat(800)[:N]
    modulated = (rng.standard_normal((D, N)) * envelope * 0.1
                 ).astype(np.float32)

    for name, scene in [('stationary', flat), ('bench-scene', modulated)]:
        obs = jax.device_put(scene)
        t_x, x_x = run('xla', obs)
        t_r, x_r = run('real', obs)
        finite = np.isfinite(x_r).all()
        dev = (np.linalg.norm(x_r - x_x) / np.linalg.norm(x_x)
               if finite else float('nan'))
        print(f'{name:11s}: xla {t_x*1e3:7.1f} ms   real {t_r*1e3:7.1f} '
              f'ms   rel_rms {dev:.3e}   finite={finite}')


if __name__ == '__main__':
    main()
