"""Matmul-only device linalg (ops/linalg.py): Gauss-Jordan inverse,
equilibrated Hermitian solve, dominant eigenvector by squaring.

These are the primitives every device-side decomposition in the pipeline
now routes through — the axon TPU backend compiles no LAPACK-style custom
calls (cholesky/LU/eig/SVD all fail), so the enhancement chain must be
expressible in matmul + elementwise primitives alone.  Parity is pinned
against NumPy/SciPy in float64 and stability checked in float32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pb_chime5_tpu.ops.linalg import (
    gauss_jordan_inverse_and_logdet, hermitian_solve, dominant_eigenvector)


def _hpd(rng, batch, d, dtype=np.complex128, cond=None):
    A = rng.standard_normal((batch, d, d)) \
        + 1j * rng.standard_normal((batch, d, d))
    M = A @ A.conj().swapaxes(-2, -1) + 0.5 * np.eye(d)
    if cond is not None:
        w, v = np.linalg.eigh(M)
        w = np.geomspace(1.0 / cond, 1.0, d)[None, :] * w[..., -1:]
        M = (v * w[..., None, :]) @ v.conj().swapaxes(-2, -1)
    return M.astype(dtype)


@pytest.mark.parametrize('d', [1, 2, 3, 5, 8, 24])
def test_gauss_jordan_inverse_matches_numpy(rng, d):
    M = _hpd(rng, 6, d)
    inv, logdet = jax.jit(gauss_jordan_inverse_and_logdet)(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(M),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(logdet),
                               np.linalg.slogdet(M)[1], atol=1e-10)


def test_gauss_jordan_float32_ill_conditioned(rng):
    # cond ~1e5 in float32: the unpivoted inverse must stay finite and
    # achieve the cond*eps-level residual a Cholesky inverse would.
    M = _hpd(rng, 4, 16, cond=1e5).astype(np.complex64)
    inv, _ = jax.jit(gauss_jordan_inverse_and_logdet)(jnp.asarray(M))
    inv = np.asarray(inv)
    assert np.all(np.isfinite(inv))
    resid = inv @ M - np.eye(16)
    assert np.max(np.abs(resid)) < 1e5 * np.finfo(np.float32).eps * 100


@pytest.mark.parametrize('d', [
    4, 24, 60, pytest.param(240, marks=pytest.mark.slow),
])
def test_hermitian_solve_matches_numpy(rng, d):
    # d <= 32 exercises the Gauss-Jordan path, d > 32 the recursive
    # Schur-complement (matmul) path — including non-power-of-two 60/240
    # (240 = taps*D of the WPE headline config).
    M = _hpd(rng, 3, d)
    B = (rng.standard_normal((3, d, 5))
         + 1j * rng.standard_normal((3, d, 5)))
    X = jax.jit(hermitian_solve)(jnp.asarray(M), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(M, B),
                               atol=1e-8)


def test_hermitian_solve_singular_is_finite(rng):
    # An exactly singular PSD matrix (zero row/col) must produce a finite
    # result (the relative diagonal load bounds the condition number) —
    # the role the reference's lstsq fallback plays (math/solve.py).
    M = _hpd(rng, 2, 6)
    M[:, 0, :] = 0
    M[:, :, 0] = 0
    B = np.ones((2, 6, 1), complex)
    X = np.asarray(hermitian_solve(jnp.asarray(M), jnp.asarray(B),
                                   relative_load=1e-8))
    assert np.all(np.isfinite(X))


def test_dominant_eigenvector_hermitian(rng):
    M = _hpd(rng, 5, 8)
    v = np.asarray(jax.jit(dominant_eigenvector)(jnp.asarray(M)))
    w, V = np.linalg.eigh(M)
    ref = V[..., -1]
    ref = ref * np.exp(-1j * np.angle(ref[..., :1]))
    np.testing.assert_allclose(v, ref, atol=1e-8)


def test_dominant_eigenvector_generalized_product(rng):
    # the GEV use: eigenvector of N^{-1} Phi (non-Hermitian, real
    # non-negative spectrum)
    import scipy.linalg
    N = _hpd(rng, 4, 6)
    P = _hpd(rng, 4, 6)
    M = np.linalg.solve(N, P)
    v = np.asarray(jax.jit(dominant_eigenvector)(jnp.asarray(M)))
    for b in range(4):
        _, V = scipy.linalg.eigh(P[b], N[b])
        r = V[:, -1] / np.linalg.norm(V[:, -1])
        r = r * np.exp(-1j * np.angle(r[0]))
        np.testing.assert_allclose(v[b], r, atol=1e-7)


def test_real_dtype_supported(rng):
    M = rng.standard_normal((3, 5, 5))
    M = M @ M.swapaxes(-2, -1) + 0.5 * np.eye(5)
    inv, logdet = gauss_jordan_inverse_and_logdet(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(M),
                               atol=1e-10)
    v = np.asarray(dominant_eigenvector(jnp.asarray(M)))
    _, V = np.linalg.eigh(M)
    ref = V[..., -1]
    ref = ref * np.sign(ref[..., :1])
    np.testing.assert_allclose(v, ref, atol=1e-8)


@pytest.mark.parametrize('d', [
    pytest.param(64, marks=pytest.mark.slow),
    pytest.param(240, marks=pytest.mark.slow),
    pytest.param(33, marks=pytest.mark.slow),
])
def test_solve_from_panels_matches_assembled_solve(rng, d):
    """The panel-direct substitution (_solve_from_panels) must agree with
    the assembled-L path (blocked_cholesky + blocked_cholesky_solve) —
    they are the same math with the big .at[].set buffers removed."""
    from pb_chime5_tpu.ops.linalg import (
        _cholesky_panels, _solve_from_panels,
        blocked_cholesky, blocked_cholesky_solve)
    M = _hpd(rng, 3, d).astype(np.complex64)
    B = (rng.standard_normal((3, d, 7))
         + 1j * rng.standard_normal((3, d, 7))).astype(np.complex64)
    col_blocks, invs, _, _ = _cholesky_panels(jnp.asarray(M))
    X_panels = np.asarray(_solve_from_panels(col_blocks, invs,
                                             jnp.asarray(B)))
    L, invs2 = blocked_cholesky(jnp.asarray(M),
                                _return_block_inverses=True)
    X_assembled = np.asarray(blocked_cholesky_solve(L, jnp.asarray(B),
                                                    inv_diag=invs2))
    np.testing.assert_allclose(X_panels, X_assembled, rtol=2e-5,
                               atol=2e-5)


def test_blocked_cholesky_tiny_scale_hpd(rng):
    """The pivot floor is RELATIVE to the matrix scale (ADVICE r3): an
    HPD matrix with diagonal << eps^2 must still factorize to a usable
    L (the old absolute eps^2 floor silently replaced every pivot)."""
    import jax.numpy as jnp
    from pb_chime5_tpu.ops.linalg import blocked_cholesky
    d = 12
    Ar = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    M = (Ar @ Ar.conj().T + d * np.eye(d)) * 1e-25   # tiny-scale HPD
    L = np.asarray(blocked_cholesky(jnp.asarray(M, jnp.complex128)))
    rec = L @ L.conj().T
    np.testing.assert_allclose(rec, M, rtol=1e-10, atol=1e-38)
