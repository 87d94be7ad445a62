"""Microbench: MXU cost model of the WPE statistics Gram at HIGHEST.

Question driving the blocked-Hermitian-Gram idea (round 3): does a
(B, M, K) x (B, K, N) complex dot on this backend cost ~ceil(M/8) x
ceil(N/128) (sublane/lane granularity -> lower-triangular column
blocking pays) or ~ceil(M/128) x ceil(N/128) (both MXU-tile-granular ->
blocking saves nothing)?

Times each shape by closing with a 4-byte checksum download (memory:
bench-ab-in-fused-program), median of NREP.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, K = 513, 2565
HI = jax.lax.Precision.HIGHEST


def make(m, n):
    # generate on-device (GB-scale operands would take minutes through
    # the dev tunnel)
    @jax.jit
    def gen():
        k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
        return (jax.random.normal(k0, (B, m, K), jnp.float32),
                jax.random.normal(k1, (B, m, K), jnp.float32),
                jax.random.normal(k2, (B, K, n), jnp.float32),
                jax.random.normal(k3, (B, K, n), jnp.float32))
    out = gen()
    jax.block_until_ready(out)
    return out


@jax.jit
def dot_cs(ar, ai, br, bi):
    a = ar + 1j * ai
    b = br + 1j * bi
    c = jnp.einsum('bmk,bkn->bmn', a, b, precision=HI)
    return jnp.sum(jnp.abs(c.real) + jnp.abs(c.imag)).reshape(1)


def bench(m, n, nrep=5):
    args = make(m, n)
    np.asarray(dot_cs(*args))          # compile + warm
    walls = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        np.asarray(dot_cs(*args))
        walls.append(time.perf_counter() - t0)
    w = sorted(walls)[nrep // 2]
    print(f'M={m:4d} N={n:4d}: {w * 1e3:7.2f} ms   '
          f'(model8x128={np.ceil(m / 8) * np.ceil(n / 128):6.0f}, '
          f'model128={np.ceil(m / 128) * np.ceil(n / 128):3.0f})')
    return w


if __name__ == '__main__':
    import sys
    shapes = [(240, 240), (240, 24), (240, 128), (264, 128),
              (136, 128), (128, 128), (8, 128), (64, 128),
              (240, 256), (256, 256)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(v) for v in s.split('x'))
                  for s in sys.argv[1:]]
    for m, n in shapes:
        bench(m, n, nrep=15)
