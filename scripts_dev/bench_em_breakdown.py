"""Dev microbench: where does the cacGMM EM time go on the chip?

Headline shapes: F=513, T=2500, D=24 (2 arrays x ... actually headline is
multiarray=True -> D=24? reference headline: 6 arrays x 4 mics = 24), K=5.
Run: PYTHONPATH=/root/.axon_site:$PYTHONPATH python scripts_dev/bench_em_breakdown.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from pb_chime5_tpu.ops.cacgmm import (
    CacgmmConfig, cacgmm_posteriors, _invert, _HIGHEST)

F, T, D, K = 513, 2500, 24, 5
ITERS = 20


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(np.asarray(jnp.sum(jnp.abs(out))))  # sync (axon quirk)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jnp.sum(jnp.abs(out))))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    Y = (rng.standard_normal((F, T, D)) +
         1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    activity = rng.random((K, T)) > 0.3
    activity[-1] = True
    Y = jnp.asarray(Y)
    act = jnp.asarray(activity)

    # 1. full EM
    cfg = CacgmmConfig(iterations=ITERS, iterations_post=1)
    t_full = timeit(lambda: cacgmm_posteriors(Y, act, config=cfg))
    print(f'full EM {ITERS}+1 iters: {t_full*1e3:.1f} ms')

    # 2. isolated inverse: (F*K, D, D) batched hermitian inverse x ITERS
    A = (rng.standard_normal((F * K, D, D)) +
         1j * rng.standard_normal((F * K, D, D))).astype(np.complex64)
    cov = A @ A.conj().swapaxes(-2, -1) + 10.0 * np.eye(D, dtype=np.complex64)
    cov = jnp.asarray(cov)

    @jax.jit
    def inv_loop(cov):
        def body(i, acc):
            p, ld = _invert(cov + (0.001 * i) * jnp.eye(D, dtype=cov.dtype),
                            cfg)
            return acc + jnp.sum(jnp.abs(p)) + jnp.sum(ld)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.))

    t_inv = timeit(inv_loop, cov)
    print(f'isolated cholesky-inverse x{ITERS}: {t_inv*1e3:.1f} ms')

    # 3. isolated E+M einsums (no inverse): same shapes, ITERS times
    z = Y / jnp.linalg.norm(Y, axis=-1, keepdims=True)
    prec0 = jnp.broadcast_to(jnp.eye(D, dtype=Y.dtype), (F, K, D, D))

    @jax.jit
    def ems_loop(z, prec):
        def body(i, carry):
            acc, prec = carry
            vz = jnp.einsum('fkde,fte->fktd', prec, z, precision=_HIGHEST)
            q = jnp.einsum('fktd,ftd->fkt', vz, z.conj(),
                           precision=_HIGHEST).real
            gamma = jax.nn.softmax(-q, axis=1)
            coeff = (gamma / jnp.maximum(q, 1e-30)).astype(z.dtype)
            weighted = z[:, None] * coeff[..., None]
            scatter = jnp.einsum('fktd,fte->fkde', weighted, z.conj(),
                                 precision=_HIGHEST)
            return acc + jnp.sum(jnp.abs(scatter)), prec
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0.), prec))
        return acc

    t_ems = timeit(ems_loop, z, prec0)
    print(f'isolated E+M einsums x{ITERS}: {t_ems*1e3:.1f} ms')

    print(f'unaccounted: {(t_full - t_inv - t_ems)*1e3:.1f} ms')


if __name__ == '__main__':
    main()
