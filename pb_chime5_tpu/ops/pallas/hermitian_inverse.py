"""Batched small Hermitian-PD inverse + log-determinant (Pallas TPU).

The cacGMM M-step inverts ~2565 (= 513 freqs x 5 classes) Hermitian
positive-definite D x D covariances (D <= 32) every EM iteration.  XLA
lowers that to batched Cholesky + two triangular solves — inherently
sequential custom calls that measured as ~half of the whole EM cost on a
v5e chip.

This kernel instead runs an *unpivoted Gauss-Jordan elimination
vectorized over the batch*: matrices are laid out (D, D, batch) so every
elimination step is an elementwise vector op over the batch lanes on the
VPU — D outer-product updates of the whole (D, D, batch) block, no
sequential inner solves, and the log-determinant falls out as the sum of
the (real, positive) pivots.  Unpivoted elimination is numerically safe
here for the same reason Cholesky is: the trailing submatrices of an HPD
matrix stay HPD, so every pivot is real and positive (the caller is
expected to add its usual diagonal loading first).

Complex arithmetic is done manually on separate real/imaginary float32
planes (TPU Pallas has no native complex support).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['hermitian_inverse_and_logdet']


def _gj_kernel(ar_ref, ai_ref, pr_ref, pi_ref, ld_ref, *, dim):
    """Gauss-Jordan over one batch chunk.

    ar/ai: (D, D, Nc) input matrix planes (consumed as scratch-like
    values), pr/pi: (D, D, Nc) inverse planes, ld: (1, Nc) log-det.
    """
    nc = ar_ref.shape[-1]
    shape = (dim, dim, nc)

    def bcast_row(row):
        """(D, Nc) -> (D, D, Nc), replicated over the leading (row) axis."""
        return jnp.broadcast_to(row[None, :, :], shape)

    def bcast_col(col):
        """(D, Nc) -> (D, D, Nc), replicated over the middle (col) axis."""
        return jnp.broadcast_to(col[:, None, :], shape)

    a_r = ar_ref[...]
    a_i = ai_ref[...]
    # identity in the (D, D, Nc) layout (full-shape iotas: Mosaic dislikes
    # singleton trailing dims)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    p_r = jnp.where(row_ids == col_ids, 1.0, 0.0)
    p_i = jnp.zeros(shape, jnp.float32)
    ld = jnp.zeros((1, nc), jnp.float32)

    for i in range(dim):
        # pivot: real for Hermitian input (imag parts only carry roundoff)
        piv = a_r[i, i, :]                                # (Nc,)
        ld = ld + jnp.log(jnp.maximum(piv, 1e-38))[None, :]
        inv_piv = (1.0 / piv)[None, :]                    # (1, Nc)

        # normalize pivot row of [A | P]
        arow_r = a_r[i] * inv_piv                         # (D, Nc)
        arow_i = a_i[i] * inv_piv
        prow_r = p_r[i] * inv_piv
        prow_i = p_i[i] * inv_piv

        # elimination factors: column i of every row (complex), zeroed at
        # the pivot row itself.  (Fresh 2-D iota: slicing the middle axis
        # of a 3-D iota crashes the Mosaic compiler on this backend.)
        not_i = (jax.lax.broadcasted_iota(jnp.int32, (dim, nc), 0) != i)
        f_r = bcast_col(jnp.where(not_i, a_r[:, i, :], 0.0))
        f_i = bcast_col(jnp.where(not_i, a_i[:, i, :], 0.0))

        br_r, br_i = bcast_row(arow_r), bcast_row(arow_i)
        bp_r, bp_i = bcast_row(prow_r), bcast_row(prow_i)

        # A -= f (x) arow ;  P -= f (x) prow   (complex outer product;
        # the pivot row has f == 0 so it passes through unchanged)
        a_r = a_r - (f_r * br_r - f_i * br_i)
        a_i = a_i - (f_r * br_i + f_i * br_r)
        p_r = p_r - (f_r * bp_r - f_i * bp_i)
        p_i = p_i - (f_r * bp_i + f_i * bp_r)

        # write back the normalized pivot rows (masked select — Mosaic has
        # no scatter)
        is_i = (row_ids == i)
        a_r = jnp.where(is_i, br_r, a_r)
        a_i = jnp.where(is_i, br_i, a_i)
        p_r = jnp.where(is_i, bp_r, p_r)
        p_i = jnp.where(is_i, bp_i, p_i)

    pr_ref[...] = p_r
    pi_ref[...] = p_i
    ld_ref[...] = ld


@functools.partial(jax.jit, static_argnames=('interpret',))
def _gj_call(ar, ai, *, interpret=False):
    """ar/ai (D, D, N) -> (pr, pi, logdet (N,)); N must be a multiple of
    the lane width already (caller pads)."""
    dim, _, n = ar.shape
    chunk = 512
    assert n % chunk == 0, (n, chunk)
    grid = (n // chunk,)
    spec3 = pl.BlockSpec((dim, dim, chunk), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM)
    spec_ld = pl.BlockSpec((1, chunk), lambda c: (0, c),
                           memory_space=pltpu.VMEM)
    pr, pi, ld = pl.pallas_call(
        functools.partial(_gj_kernel, dim=dim),
        grid=grid,
        in_specs=[spec3, spec3],
        out_specs=(spec3, spec3, spec_ld),
        out_shape=(
            jax.ShapeDtypeStruct((dim, dim, n), jnp.float32),
            jax.ShapeDtypeStruct((dim, dim, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        interpret=interpret,
    )(ar, ai)
    return pr, pi, ld[0]


def hermitian_inverse_and_logdet(B, *, interpret=False):
    """(..., D, D) complex Hermitian-PD -> (inverse (..., D, D) complex64,
    logdet (...,) float32).

    The caller must ensure positive-definiteness (diagonal loading); this
    function performs no pivoting.
    """
    B = jnp.asarray(B)
    batch_shape = B.shape[:-2]
    dim = B.shape[-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1

    flat = B.reshape(n, dim, dim)
    # pad the batch to a multiple of the kernel chunk (identity matrices:
    # trivially invertible, discarded after)
    pad = (-n) % 512
    if pad:
        eye = jnp.eye(dim, dtype=B.dtype)
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(eye, (pad, dim, dim))], axis=0)

    ar = jnp.transpose(flat.real, (1, 2, 0)).astype(jnp.float32)
    ai = jnp.transpose(flat.imag, (1, 2, 0)).astype(jnp.float32)
    pr, pi, ld = _gj_call(ar, ai, interpret=interpret)
    inv = (jnp.transpose(pr, (2, 0, 1))
           + 1j * jnp.transpose(pi, (2, 0, 1))).astype(jnp.complex64)
    if pad:
        inv = inv[:n]
        ld = ld[:n]
    return inv.reshape(*batch_shape, dim, dim), ld.reshape(batch_shape)
