"""Dev microbench: where the WPE milliseconds go on the chip.

The axon backend cannot pass complex across the jit boundary and defers
execution until a download, so each measurement is a real-in/real-out
jitted program that is a PREFIX of one WPE iteration; stage costs are
differences of consecutive prefixes (same technique as bench_stages.py).

Run: python scripts_dev/bench_wpe_breakdown.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from pb_chime5_tpu.ops.stft import stft_frame_count
from pb_chime5_tpu.ops.wpe import build_y_tilde, get_power_inverse, wpe
from pb_chime5_tpu.ops.linalg import hermitize, hermitian_solve

_HIGHEST = jax.lax.Precision.HIGHEST

FS = 16000
SECONDS = 40.0
N = int(SECONDS * FS)
D, F, TAPS, DELAY = 24, 513, 10, 2
T = stft_frame_count(N, 1024, 256, fading=True)
TD = TAPS * D


def force(out):
    leaves = jax.tree_util.tree_leaves(out)
    acc = sum(jnp.sum(jnp.abs(x)) for x in leaves)
    return float(np.asarray(jnp.real(acc).reshape(1))[0])


def bench(name, f, *args, reps=5):
    force(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f'{name}: {min(ts)*1e3:7.1f} ms')
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    print(f'shapes: F={F} D={D} taps={TAPS} T={T} (taps*D={TD})')
    Yr = jax.device_put(rng.standard_normal((F, D, T)).astype(np.float32))
    Yi = jax.device_put(rng.standard_normal((F, D, T)).astype(np.float32))

    def prefix(stage, precision=_HIGHEST):
        """Build a jitted prefix of one WPE iteration up to `stage`."""
        @jax.jit
        def f(yr, yi):
            Y = yr + 1j * yi
            outs = []
            w = get_power_inverse(Y)
            if stage == 'power':
                return w
            Yt = build_y_tilde(Y, TAPS, DELAY)
            if stage == 'build':
                return jnp.abs(Yt).sum()
            weighted = Yt * w[:, None, :].astype(Yt.dtype)
            if stage == 'weight':
                return jnp.abs(weighted).sum()
            R = jnp.einsum('fit,fjt->fij', weighted, Yt.conj(),
                           precision=precision)
            if stage == 'R':
                return jnp.abs(R).sum()
            P = jnp.einsum('fit,fjt->fij', weighted, Y.conj(),
                           precision=precision)
            if stage == 'P':
                return jnp.abs(R).sum() + jnp.abs(P).sum()
            R = hermitize(R)
            G = hermitian_solve(R, P, relative_load=1e-4)
            if stage == 'solve':
                return jnp.abs(G).sum()
            tail = jnp.einsum('fid,fit->fdt', G.conj(), Yt,
                              precision=precision)
            X = Y - tail
            return jnp.abs(X).sum()
        return f

    t_pow = bench('power inverse only      ', prefix('power'), Yr, Yi)
    t_build = bench('+ build_y_tilde         ', prefix('build'), Yr, Yi)
    t_weight = bench('+ weighted copy         ', prefix('weight'), Yr, Yi)
    t_R = bench('+ R einsum (240x240)    ', prefix('R'), Yr, Yi)
    t_P = bench('+ P einsum (240x24)     ', prefix('P'), Yr, Yi)
    t_solve = bench('+ hermitian_solve       ', prefix('solve'), Yr, Yi)
    t_tail = bench('+ tail (full iteration) ', prefix('tail'), Yr, Yi)
    print()
    print(f'deltas: build {1e3*(t_build-t_pow):.1f}  '
          f'weight {1e3*(t_weight-t_build):.1f}  '
          f'R {1e3*(t_R-t_weight):.1f}  '
          f'P {1e3*(t_P-t_R):.1f}  '
          f'solve {1e3*(t_solve-t_P):.1f}  '
          f'tail {1e3*(t_tail-t_solve):.1f} ms')

    t_R_high = bench('R prefix @ HIGH precision',
                     prefix('R', jax.lax.Precision.HIGH), Yr, Yi)
    t_iter_high = bench('full iter @ HIGH        ',
                        prefix('tail', jax.lax.Precision.HIGH), Yr, Yi)
    print(f'R @ HIGH saves {1e3*(t_R - t_R_high):.1f} ms; '
          f'iter @ HIGH saves {1e3*(t_tail - t_iter_high):.1f} ms')

    # reference: the real wpe() at production settings
    @jax.jit
    def f_wpe(yr, yi):
        X = wpe(yr + 1j * yi, taps=TAPS, delay=DELAY, iterations=3)
        return jnp.abs(X).sum()
    bench('wpe(iterations=3)       ', f_wpe, Yr, Yi)


if __name__ == '__main__':
    main()
