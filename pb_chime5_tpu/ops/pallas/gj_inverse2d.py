"""Batched small Hermitian-PD inverse + log-determinant (Pallas TPU),
flat 2-D layout.

The cacGMM M-step inverts ~2565 (= 513 freqs x 5 classes) Hermitian
positive-definite D x D covariances (D <= 32) every EM iteration
(reference workload: pb_chime5/core.py:171-206).  The XLA formulation
(ops/linalg.py::gauss_jordan_inverse_and_logdet) is memory-bound: each of
the D rank-1 pivot steps rewrites the whole (N, D, D) batch in HBM —
~2.8 GB of traffic for the 24-channel headline config, ~3.5 ms per
inversion, ~half the EM stage cost.

Here the matrices stay in VMEM across all D pivot steps: total HBM
traffic is one read + one write of the batch (~24 MB).  The layout is the
2-D one Mosaic actually compiles (the earlier (D, D, batch) 3-D kernel in
hermitian_inverse.py crashes the Mosaic compiler; see its docstring):

* matrices are flattened to rows of a (batch, D*D) plane, lane
  l = i*D + j  <->  A[i, j]; the batch rides the sublanes,
* every pivot step is elementwise on the (Nc, D*D) tile,
* row/column extraction and block broadcasts are expressed as dots with
  0/1 selection matrices built from 2-D iotas (the fused-EM kernel's
  block-one-hot pattern, ops/pallas/fused_em.py) — no 3-D values, no
  reshapes, no strided gathers,
* selection dots run at ``precision=HIGHEST`` so float32 payloads pass
  through the 0/1 matrices without bf16 truncation,
Three more Mosaic triggers were bisected on this backend (each crashes
``vector_extract_strided_slice`` in the vector-layout pass; minimal
repros in the git history of scripts_dev/):

* single-lane slices ``a[:, l:l+1]`` (width-D unaligned lane slices are
  fine) — the pivot value is instead broadcast across lanes by a masked
  dot with an all-ones matrix (one nonzero summand per row: exact),
* a narrow (< 128-lane) output block fed by an accumulator carried
  across unrolled iterations (a one-shot keepdims-sum into a (Nc, 1)
  block is fine, and a carried accumulator written out through a
  full-width concatenate is fine) — the log-determinant therefore
  leaves the kernel lane-replicated at (Nc, D*D) width, lane 0 sliced
  off outside,
* in-kernel transposes (``Ci.T``) — selection matrices are built
  directly in the orientation each dot consumes,
* unaligned lane slices of a value that was INITIALIZED IN-KERNEL from
  an iota (the identity plane P): slicing a ref-loaded value is fine,
  but the same slice on the carried iota-derived plane crashes the
  layout pass — P's pivot row is therefore extracted with a selection
  dot instead of a slice.

Complex arithmetic uses separate real/imaginary float32 planes (TPU
Pallas has no native complex).  Unpivoted elimination is numerically safe
for HPD input for the same reason Cholesky is: trailing submatrices stay
HPD, so every pivot is real and positive (callers add their usual
diagonal loading first, exactly as for the XLA path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['hermitian_inverse_and_logdet_2d']

_HIGHEST = jax.lax.Precision.HIGHEST


def _gj2d_kernel(ar_ref, ai_ref, pr_ref, pi_ref, ld_ref, *, dim):
    DD = dim * dim
    a_r = ar_ref[...]                              # (Nc, DD)
    a_i = ai_ref[...]
    nc = a_r.shape[0]

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST)

    lane = jax.lax.broadcasted_iota(jnp.int32, (nc, DD), 1)
    # identity plane: lane i*D+j is diagonal iff i == j iff l % (D+1) == 0
    p_r = jnp.where(lane % (dim + 1) == 0, 1.0, 0.0).astype(jnp.float32)
    p_i = jnp.zeros((nc, DD), jnp.float32)
    ld = jnp.zeros((nc, dim), jnp.float32)

    # selection constants (2-D iota comparisons; traced once, reused):
    # Mrow[k, j*D+k] = 1   -> dot(row (Nc, D), Mrow) tiles the row into
    #                         every row-block of the flat layout
    # Mcol[j, j*D+k] = 1   -> dot(col (Nc, D), Mcol) replicates element j
    #                         across row-block j
    l_of = jax.lax.broadcasted_iota(jnp.int32, (dim, DD), 1)
    k_of = jax.lax.broadcasted_iota(jnp.int32, (dim, DD), 0)
    Mrow = jnp.where(l_of % dim == k_of, 1.0, 0.0).astype(jnp.float32)
    Mcol = jnp.where(l_of // dim == k_of, 1.0, 0.0).astype(jnp.float32)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (nc, dim), 1)
    ones_dd = jnp.ones((dim, dim), jnp.float32)
    tiny = jnp.float32(np.finfo(np.float32).tiny)

    l_of2 = jax.lax.broadcasted_iota(jnp.int32, (DD, dim), 0)
    k_of2 = jax.lax.broadcasted_iota(jnp.int32, (DD, dim), 1)

    for i in range(dim):
        # column i of A (lane j*D+i for each row block j); CiT built
        # directly (DD, D)-oriented — in-kernel .T crashes Mosaic
        CiT = jnp.where(l_of2 % dim == i,
                        jnp.where(l_of2 // dim == k_of2, 1.0, 0.0),
                        0.0).astype(jnp.float32)             # (DD, D)
        col_r = dot(a_r, CiT)                                # (Nc, D)
        col_i = dot(a_i, CiT)

        # pivot A[i, i] = col[:, i]: real for Hermitian input (imag
        # carries only roundoff).  Broadcast across all D lanes with a
        # masked ones-dot (single nonzero summand per row: exact).
        pvmask = (jrow == i)
        pv = dot(jnp.where(pvmask, col_r, 0.0), ones_dd)     # (Nc, D)
        pv = jnp.maximum(pv, tiny)
        ld = ld + jnp.log(pv)   # same pivot value in all D lanes
        inv_piv = 1.0 / pv                                   # (Nc, D)

        # normalized pivot row of [A | P].  A (ref-loaded) tolerates the
        # width-D lane slice; P (in-kernel iota init) must use a
        # selection dot instead (see module docstring).
        arow_r = a_r[:, i * dim:(i + 1) * dim] * inv_piv     # (Nc, D)
        arow_i = a_i[:, i * dim:(i + 1) * dim] * inv_piv
        RiT = jnp.where(l_of2 // dim == i,
                        jnp.where(l_of2 % dim == k_of2, 1.0, 0.0),
                        0.0).astype(jnp.float32)             # (DD, D)
        prow_r = dot(p_r, RiT) * inv_piv
        prow_i = dot(p_i, RiT) * inv_piv

        # elimination factors, zeroed at the pivot row itself
        f_r = jnp.where(pvmask, 0.0, col_r)
        f_i = jnp.where(pvmask, 0.0, col_i)

        fb_r = dot(f_r, Mcol)                                # (Nc, DD)
        fb_i = dot(f_i, Mcol)
        rb_r = dot(arow_r, Mrow)
        rb_i = dot(arow_i, Mrow)
        qb_r = dot(prow_r, Mrow)
        qb_i = dot(prow_i, Mrow)

        # [A | P] -= f (x) [arow | prow]  (the pivot block has f == 0)
        a_r = a_r - (fb_r * rb_r - fb_i * rb_i)
        a_i = a_i - (fb_r * rb_i + fb_i * rb_r)
        p_r = p_r - (fb_r * qb_r - fb_i * qb_i)
        p_i = p_i - (fb_r * qb_i + fb_i * qb_r)

        # write back the normalized pivot row block
        in_blk = (lane // dim == i)
        a_r = jnp.where(in_blk, rb_r, a_r)
        a_i = jnp.where(in_blk, rb_i, a_i)
        p_r = jnp.where(in_blk, qb_r, p_r)
        p_i = jnp.where(in_blk, qb_i, p_i)

    pr_ref[...] = p_r
    pi_ref[...] = p_i
    ld_ref[...] = jnp.concatenate([ld] * dim, axis=1)


@functools.partial(jax.jit, static_argnames=('interpret', 'chunk'))
def _gj2d_call(ar, ai, *, interpret=False, chunk=256):
    n, dd = ar.shape
    dim = int(round(dd ** 0.5))
    assert n % chunk == 0, (n, chunk)
    spec = pl.BlockSpec((chunk, dd), lambda c: (c, 0),
                        memory_space=pltpu.VMEM)
    spec_ld = pl.BlockSpec((chunk, dd), lambda c: (c, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gj2d_kernel, dim=dim),
        grid=(n // chunk,),
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec_ld),
        out_shape=(
            jax.ShapeDtypeStruct((n, dd), jnp.float32),
            jax.ShapeDtypeStruct((n, dd), jnp.float32),
            jax.ShapeDtypeStruct((n, dd), jnp.float32),
        ),
        interpret=interpret,
    )(ar, ai)


def hermitian_inverse_and_logdet_2d(B, *, interpret=None, chunk=256):
    """(..., D, D) complex Hermitian-PD -> (inverse (..., D, D) complex64,
    logdet (...,) float32).

    Callers must ensure positive definiteness (diagonal loading); no
    pivoting is performed.  Pallas on TPU, interpret mode elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    B = jnp.asarray(B)
    batch_shape = B.shape[:-2]
    dim = B.shape[-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1

    flat = B.reshape(n, dim * dim)
    pad = (-n) % chunk
    if pad:
        # pad with identity matrices: trivially invertible, discarded
        eye = jnp.eye(dim, dtype=B.dtype).reshape(1, dim * dim)
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(eye, (pad, dim * dim))], axis=0)

    pr, pi, ld = _gj2d_call(flat.real.astype(jnp.float32),
                            flat.imag.astype(jnp.float32),
                            interpret=interpret, chunk=chunk)
    inv = (pr + 1j * pi).astype(jnp.complex64)
    ld = ld[:, 0]
    if pad:
        inv = inv[:n]
        ld = ld[:n]
    return (inv.reshape(*batch_shape, dim, dim),
            ld.reshape(batch_shape))
