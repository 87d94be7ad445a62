"""Dev experiments: WPE solve block-size sweep + combined R|P einsum.

Run: python scripts_dev/bench_wpe_opts.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from pb_chime5_tpu.ops.stft import stft_frame_count
from pb_chime5_tpu.ops.wpe import build_y_tilde, get_power_inverse
from pb_chime5_tpu.ops.linalg import (
    hermitize, blocked_cholesky, blocked_cholesky_solve)

_HIGHEST = jax.lax.Precision.HIGHEST

FS = 16000
N = int(40.0 * FS)
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
    Yr = jax.device_put(rng.standard_normal((F, D, T)).astype(np.float32))
    Yi = jax.device_put(rng.standard_normal((F, D, T)).astype(np.float32))

    def make_RP(yr, yi):
        Y = yr + 1j * yi
        w = get_power_inverse(Y)
        Yt = build_y_tilde(Y, TAPS, DELAY)
        weighted = Yt * w[:, None, :].astype(Yt.dtype)
        R = hermitize(jnp.einsum('fit,fjt->fij', weighted, Yt.conj(),
                                 precision=_HIGHEST))
        P = jnp.einsum('fit,fjt->fij', weighted, Y.conj(),
                       precision=_HIGHEST)
        return R, P

    # baseline: R,P then solve at each block size
    def solve_at(block):
        @jax.jit
        def f(yr, yi):
            R, P = make_RP(yr, yi)
            d = R.shape[-1]
            diag = jnp.diagonal(R, axis1=-2, axis2=-1).real
            s = jnp.sqrt(jnp.maximum(
                diag, jnp.max(diag, -1, keepdims=True) * 1e-7))
            sinv = (1.0 / s).astype(R.dtype)
            As = hermitize(R * sinv[..., :, None] * sinv[..., None, :])
            As = As + 1e-4 * jnp.eye(d, dtype=R.dtype)
            L, invs = blocked_cholesky(As, block=block,
                                       _return_block_inverses=True)
            X = blocked_cholesky_solve(L, sinv[..., :, None] * P,
                                       block=block, inv_diag=invs)
            return jnp.abs(sinv[..., :, None] * X).sum()
        return f

    @jax.jit
    def f_stats_only(yr, yi):
        R, P = make_RP(yr, yi)
        return jnp.abs(R).sum() + jnp.abs(P).sum()
    t_stats = bench('stats only (R,P separate)', f_stats_only, Yr, Yi)

    @jax.jit
    def f_stats_combined(yr, yi):
        Y = yr + 1j * yi
        w = get_power_inverse(Y)
        Yt = build_y_tilde(Y, TAPS, DELAY)
        Z = jnp.concatenate([Yt, Y], axis=1)
        weighted = Yt * w[:, None, :].astype(Yt.dtype)
        S = jnp.einsum('fit,fjt->fij', weighted, Z.conj(),
                       precision=_HIGHEST)
        R = hermitize(S[..., :TD])
        P = S[..., TD:]
        return jnp.abs(R).sum() + jnp.abs(P).sum()
    t_comb = bench('stats combined (264 cols)', f_stats_combined, Yr, Yi)

    # numerical check: combined R|P slices must equal the separate einsums
    @jax.jit
    def f_check(yr, yi):
        Y = yr + 1j * yi
        w = get_power_inverse(Y)
        Yt = build_y_tilde(Y, TAPS, DELAY)
        Z = jnp.concatenate([Yt, Y], axis=1)
        weighted = Yt * w[:, None, :].astype(Yt.dtype)
        S = jnp.einsum('fit,fjt->fij', weighted, Z.conj(),
                       precision=_HIGHEST)
        R, P = make_RP(yr, yi)
        dr = jnp.max(jnp.abs(hermitize(S[..., :TD]) - R))
        dp = jnp.max(jnp.abs(S[..., TD:] - P))
        return jnp.stack([dr, dp])
    dr, dp = np.asarray(f_check(Yr, Yi))
    print(f'combined saves {1e3*(t_stats-t_comb):.1f} ms/iter '
          f'(max R diff {dr:.2e}, P diff {dp:.2e})')

    for block in (32, 48, 60, 80, 120):
        bench(f'stats + solve block={block:3d} ', solve_at(block), Yr, Yi)


if __name__ == '__main__':
    main()
