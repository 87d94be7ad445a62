"""Pallas kernels (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pb_chime5_tpu.ops.pallas import hermitian_inverse_and_logdet


def _random_hpd(rng, n, d, dtype=np.complex64):
    A = rng.standard_normal((n, d, d)) + 1j * rng.standard_normal((n, d, d))
    B = A @ A.conj().transpose(0, 2, 1) + d * np.eye(d)
    return B.astype(dtype)


@pytest.mark.parametrize('d', [4, 8, 24])
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


@pytest.mark.parametrize('d', [4, 24, 32])
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
