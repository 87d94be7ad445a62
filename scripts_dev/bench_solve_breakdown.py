"""Dev microbench: where the WPE hermitian_solve milliseconds go.

Pieces of the (F=513, 240, 240) solve timed as prefix programs (the
backend defers execution until a download; differences of prefixes are
the stage costs).

Run: python scripts_dev/bench_solve_breakdown.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from pb_chime5_tpu.ops import linalg

F, DIM, E = 513, 240, 24


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
    Xr = rng.standard_normal((F, DIM, 300)).astype(np.float32)
    Xi = rng.standard_normal((F, DIM, 300)).astype(np.float32)
    Br = jax.device_put(rng.standard_normal((F, DIM, E)).astype(np.float32))
    Bi = jax.device_put(rng.standard_normal((F, DIM, E)).astype(np.float32))
    Xr = jax.device_put(Xr)
    Xi = jax.device_put(Xi)

    def make_A(xr, xi):
        X = xr + 1j * xi
        A = jnp.matmul(X, X.conj().swapaxes(-2, -1),
                       precision=jax.lax.Precision.HIGHEST) / 300
        return A + 0.01 * jnp.eye(DIM, dtype=A.dtype)

    t0 = bench('make_A only            ',
               jax.jit(lambda xr, xi: jnp.abs(make_A(xr, xi)).sum()),
               Xr, Xi)

    def chol_at(block=32):
        @jax.jit
        def f(xr, xi):
            A = make_A(xr, xi)
            L = linalg.blocked_cholesky(A, block=block)
            return jnp.abs(L).sum()
        return f

    t1 = bench('+ blocked_cholesky     ', chol_at(), Xr, Xi)

    @jax.jit
    def f_full(xr, xi, br, bi):
        A = make_A(xr, xi)
        G = linalg.hermitian_solve(A, br + 1j * bi, relative_load=1e-4)
        return jnp.abs(G).sum()
    t2 = bench('+ full hermitian_solve ', f_full, Xr, Xi, Br, Bi)

    print(f'deltas: cholesky {1e3*(t1-t0):.1f} ms, '
          f'equilibrate+substitution {1e3*(t2-t1):.1f} ms')

    # factor-panel loop only: the full 32x32 diagonal blocks batched as
    # one call (DIM=240 holds 7 full blocks; the 16-wide tail is skipped)
    nfull = DIM // 32

    @jax.jit
    def f_panels(xr, xi):
        A = make_A(xr, xi)
        blks = [A[:, j*32:(j+1)*32, j*32:(j+1)*32] for j in range(nfull)]
        stacked = jnp.stack(blks, axis=0)        # (nfull, F, 32, 32)
        L = linalg.blocked_cholesky(
            stacked.reshape(nfull * F, 32, 32), block=32)
        return jnp.abs(L).sum()
    bench(f'{nfull} diag panels, one batch', f_panels, Xr, Xi)


if __name__ == '__main__':
    main()
