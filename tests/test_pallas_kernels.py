"""Pallas kernels (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pb_chime5_tpu.ops.pallas import hermitian_inverse_and_logdet


def _random_hpd(rng, n, d, dtype=np.complex64):
    A = rng.standard_normal((n, d, d)) + 1j * rng.standard_normal((n, d, d))
    B = A @ A.conj().transpose(0, 2, 1) + d * np.eye(d)
    return B.astype(dtype)


@pytest.mark.parametrize('d', [
    4, 8, pytest.param(24, marks=pytest.mark.slow),
])
def test_inverse_matches_numpy(rng, d):
    B = _random_hpd(rng, 7, d)
    inv, ld = hermitian_inverse_and_logdet(jnp.asarray(B), interpret=True)
    inv = np.asarray(inv)
    ld = np.asarray(ld)
    want_inv = np.linalg.inv(B.astype(np.complex128))
    want_ld = np.linalg.slogdet(B.astype(np.complex128))[1]
    np.testing.assert_allclose(inv, want_inv, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(ld, want_ld, rtol=1e-4)


def test_inverse_batched_shapes(rng):
    B = _random_hpd(rng, 6, 8).reshape(2, 3, 8, 8)
    inv, ld = hermitian_inverse_and_logdet(jnp.asarray(B), interpret=True)
    assert inv.shape == (2, 3, 8, 8)
    assert ld.shape == (2, 3)
    prod = np.asarray(inv) @ B
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(8), prod.shape),
                               atol=1e-3)


# slow: numerics edge case (the parity tests above stay fast)
@pytest.mark.slow
def test_inverse_ill_conditioned(rng):
    """Near-singular + loading stays finite (the EM's usage pattern)."""
    d = 16
    u = rng.standard_normal((3, d, 1)) + 1j * rng.standard_normal((3, d, 1))
    B = (u @ u.conj().transpose(0, 2, 1)).astype(np.complex64)
    tr = np.trace(B, axis1=-2, axis2=-1).real
    B = B + (1e-6 * tr / d)[:, None, None] * np.eye(d, dtype=np.complex64)
    inv, ld = hermitian_inverse_and_logdet(jnp.asarray(B), interpret=True)
    assert np.isfinite(np.asarray(inv)).all()
    assert np.isfinite(np.asarray(ld)).all()


# --- gj_inverse2d: the flat-2-D-layout kernel that Mosaic compiles ---

from pb_chime5_tpu.ops.pallas.gj_inverse2d import (
    hermitian_inverse_and_logdet_2d)


@pytest.mark.parametrize('d', [
    4, 24, pytest.param(32, marks=pytest.mark.slow),
])
def test_inverse2d_matches_numpy(rng, d):
    B = _random_hpd(rng, 7, d)
    inv, ld = hermitian_inverse_and_logdet_2d(jnp.asarray(B),
                                              interpret=True)
    want_inv = np.linalg.inv(B.astype(np.complex128))
    want_ld = np.linalg.slogdet(B.astype(np.complex128))[1]
    np.testing.assert_allclose(np.asarray(inv), want_inv,
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ld), want_ld, rtol=1e-4)


def test_inverse2d_batched_shapes_and_padding(rng):
    # batch 6 is far from the 256 chunk: exercises identity padding
    B = _random_hpd(rng, 6, 8).reshape(2, 3, 8, 8)
    inv, ld = hermitian_inverse_and_logdet_2d(jnp.asarray(B),
                                              interpret=True)
    assert inv.shape == (2, 3, 8, 8)
    assert ld.shape == (2, 3)
    want = np.linalg.inv(B.astype(np.complex128))
    np.testing.assert_allclose(np.asarray(inv), want, atol=2e-4, rtol=2e-3)


def test_inverse2d_matches_xla_gj(rng):
    """The kernel and the XLA batched GJ must agree tightly: they are
    interchangeable backends for the same EM step (cacgmm._invert)."""
    from pb_chime5_tpu.ops.linalg import gauss_jordan_inverse_and_logdet
    B = _random_hpd(rng, 13, 24)
    inv_k, ld_k = hermitian_inverse_and_logdet_2d(jnp.asarray(B),
                                                  interpret=True)
    inv_x, ld_x = gauss_jordan_inverse_and_logdet(jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(inv_k), np.asarray(inv_x),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_x),
                               rtol=1e-5)


def test_fused_em_scatter_custom_tile_fallback(rng):
    """fused_em_scatter_prepared called WITHOUT time_tile after a prepare
    with a custom tile must resolve a bounded divisor of the padded length
    (not one giant tile) and match the explicit-tile result (ADVICE r2)."""
    from pb_chime5_tpu.ops.pallas.fused_em import (
        _MAX_TIME_TILE, fused_em_scatter_prepared, prepare_em_inputs,
        resolve_time_tile)

    F, T, D, K = 2, 4500, 2, 2
    tile = 1000          # padded length 5000; default resolution (2048)
    #                      does not divide it -> fallback path
    z = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    z = z / np.linalg.norm(z, axis=-1, keepdims=True)
    act = (rng.random((K, T)) > 0.3)
    act[-1] = True
    zpack, act_p, fm = prepare_em_inputs(z, act, None, K, time_tile=tile)
    z2 = zpack[0]
    assert z2.shape[1] == 5000 and z2.shape[1] % resolve_time_tile(5000)
    params = (jnp.zeros((F, K), jnp.float32),
              jnp.broadcast_to(jnp.eye(D, dtype=jnp.complex64),
                               (F, K, D, D)),
              jnp.zeros((F, K), jnp.float32))
    S_auto, den_auto = fused_em_scatter_prepared(
        zpack, act_p, fm, params, D=D, interpret=True)
    S_ref, den_ref = fused_em_scatter_prepared(
        zpack, act_p, fm, params, D=D, time_tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(S_auto), np.asarray(S_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(den_auto), np.asarray(den_ref),
                               atol=1e-5)


# slow tier (~12 s): parity guard for a measured-dead-end exemplar kernel,
# not a production path
@pytest.mark.slow
def test_chol_solve_matches_hermitian_solve(rng):
    """In-VMEM blocked Cholesky solve (interpret mode) vs the XLA
    equilibrated solve — same load, same equilibration.  On-chip this
    kernel COMPILES and matches to 8e-7 at the WPE production shape but
    loses 203 ms vs 54 ms to XLA (see docs/ARCHITECTURE.md round-3
    ledger: the 262k sequential in-kernel factor steps dominate); it is
    kept as the working exemplar of an in-VMEM blocked factorization
    that this backend's Mosaic actually compiles."""
    from pb_chime5_tpu.ops.pallas.chol_solve import hermitian_solve_pallas
    from pb_chime5_tpu.ops.linalg import hermitian_solve

    F, D, E = 3, 48, 6
    A = rng.standard_normal((F, D, D)) \
        + 1j * rng.standard_normal((F, D, D))
    A = (A @ A.conj().transpose(0, 2, 1)).astype(np.complex64) \
        + D * np.eye(D, dtype=np.complex64)
    B = (rng.standard_normal((F, D, E))
         + 1j * rng.standard_normal((F, D, E))).astype(np.complex64)
    X_ref = np.asarray(hermitian_solve(
        jnp.asarray(A), jnp.asarray(B), relative_load=1e-4))
    X_pal = np.asarray(hermitian_solve_pallas(
        jnp.asarray(A), jnp.asarray(B), relative_load=1e-4,
        interpret=True))
    err = np.abs(X_pal - X_ref).max() / np.abs(X_ref).max()
    assert err < 1e-4, err
