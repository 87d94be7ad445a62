"""Dev A/B: formulations of the WPE cross-correlation vector P.

The shape microbench (bench_gram_shapes.py) showed the complex
(240, T) x (T, 24) product costs ~3.4x its FLOP share (small-N padding).
Candidates at the headline shape (F=513, dim=240, D=24, T=2565), all in
real arithmetic like the production stats backend:

  a) '4dot'   — P via 4 real (dim, T) x (T, D) dots (the current form,
                as 2 strips x 4 = 8 strip dots)
  b) 'folded' — append Yr/Yi columns to the LAST staircase column block
                so P rides inside the symmetric-Gram dots' N=128 padding
                for free (cols 120..144 of the second strip block)

Times the stats portion standalone (stft+wpe would hide it); close with
a 4-byte download; median of 9.

Run: python scripts_dev/bench_p_form.py
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

F, D, T, TAPS = 513, 24, 2565, 10
DIM = TAPS * D
HI = jax.lax.Precision.HIGHEST


def gen():
    @jax.jit
    def f():
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        U = [jax.random.normal(ks[0], (F, 120, T), jnp.float32),
             jax.random.normal(ks[1], (F, 120, T), jnp.float32)]
        V = [jax.random.normal(ks[2], (F, 120, T), jnp.float32),
             jax.random.normal(ks[3], (F, 120, T), jnp.float32)]
        Yr = jax.random.normal(ks[4], (F, D, T), jnp.float32)
        Yi = jax.random.normal(ks[5], (F, D, T), jnp.float32)
        w = jnp.abs(jax.random.normal(ks[0], (F, T), jnp.float32)) + 0.1
        return U, V, Yr, Yi, w
    out = f()
    jax.block_until_ready(out)
    return out


def dot(a, b):
    return jnp.einsum('fit,fjt->fij', a, b, precision=HI)


@jax.jit
def stats_4dot(U0, U1, V0, V1, Yr, Yi, w):
    U, V = [U0, U1], [V0, V1]
    Uw = [u * w[:, None, :] for u in U]
    Vw = [v * w[:, None, :] for v in V]
    acc = 0.0
    # symmetric staircase (lower blocks)
    for i in range(2):
        for j in range(i + 1):
            acc += jnp.sum(dot(Uw[i], U[j]) + dot(Vw[i], V[j]))
    # antisymmetric full
    for i in range(2):
        for j in range(2):
            acc += jnp.sum(dot(Vw[i], U[j]))
    # P: 8 small dots
    for i in range(2):
        acc += jnp.sum(dot(Uw[i], Yr) + dot(Vw[i], Yi))
        acc += jnp.sum(dot(Vw[i], Yr) - dot(Uw[i], Yi))
    return acc.reshape(1)


@jax.jit
def stats_folded(U0, U1, V0, V1, Yr, Yi, w):
    """P folded into the second column block: the right operand of the
    last staircase column is [U1 | Yr | Yi] (120+48=168 cols -> same
    256-lane padding class as 120... measured question), and the
    antisymmetric block gets the same treatment."""
    U, V = [U0, U1], [V0, V1]
    Uw = [u * w[:, None, :] for u in U]
    Vw = [v * w[:, None, :] for v in V]
    acc = 0.0
    # first staircase column (unchanged)
    for i in range(2):
        acc += jnp.sum(dot(Uw[i], U[0]) + dot(Vw[i], V[0]))
    # second column extended with the P columns
    U1y = jnp.concatenate([U[1], Yr, Yi], axis=1)    # (F, 168, T)
    V1y = jnp.concatenate([V[1], Yi, Yr], axis=1)    # pairing for sums
    acc += jnp.sum(dot(Uw[1], U1y) + dot(Vw[1], V1y))
    acc += jnp.sum(dot(Uw[0], jnp.concatenate([Yr, Yi], axis=1)))
    acc += jnp.sum(dot(Vw[0], jnp.concatenate([Yi, Yr], axis=1)))
    # antisymmetric full (unchanged)
    for i in range(2):
        for j in range(2):
            acc += jnp.sum(dot(Vw[i], U[j]))
    return acc.reshape(1)


def bench(name, f, args, nrep=9):
    np.asarray(f(*args))
    ts = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    w = sorted(ts)[nrep // 2]
    print(f'{name:8s}: {w*1e3:7.2f} ms')
    return w


def main():
    U, V, Yr, Yi, w = gen()
    args = (*U, *V, Yr, Yi, w)
    bench('4dot', stats_4dot, args)
    bench('folded', stats_folded, args)


if __name__ == '__main__':
    main()

@jax.jit
def stats_folded_both(U0, U1, V0, V1, Yr, Yi, w):
    """P folded into BOTH strips' diagonal dots: for each strip i the
    right operand of the (i, i) symmetric dots is [U_i|Yr|Yi] /
    [V_i|Yi|Yr] — zero standalone P dots."""
    U, V = [U0, U1], [V0, V1]
    Uw = [u * w[:, None, :] for u in U]
    Vw = [v * w[:, None, :] for v in V]
    acc = 0.0
    # off-diagonal lower block (1, 0) unchanged
    acc += jnp.sum(dot(Uw[1], U[0]) + dot(Vw[1], V[0]))
    # diagonal blocks extended with the P columns
    for i in range(2):
        acc += jnp.sum(dot(Uw[i], jnp.concatenate([U[i], Yr, Yi], axis=1)))
        acc += jnp.sum(dot(Vw[i], jnp.concatenate([V[i], Yi, Yr], axis=1)))
    # antisymmetric full (unchanged)
    for i in range(2):
        for j in range(2):
            acc += jnp.sum(dot(Vw[i], U[j]))
    return acc.reshape(1)
