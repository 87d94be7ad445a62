"""Batched linear-algebra helpers for the enhancement chain.

``stable_solve`` reproduces the capability of the reference's
pb_chime5/math/solve.py:20-114 (``np.linalg.solve`` with a least-squares
fallback for singular matrices) in a jit-compatible way: the fallback is a
batched Moore-Penrose pseudo-inverse (SVD), selected per matrix wherever the
direct solve produced non-finite values.  Inside ``jit`` we cannot branch on
data, so both paths are computed and blended with ``jnp.where`` — the pinv
path is tiny (D <= 30) compared to the surrounding matmuls.
"""

import jax
import jax.numpy as jnp

__all__ = ['hermitize', 'stable_solve', 'stable_cholesky', 'eye_like']


def hermitize(mat):
    """Force Hermitian symmetry: ``(A + A^H) / 2``."""
    return 0.5 * (mat + jnp.swapaxes(mat, -2, -1).conj())


def eye_like(mat):
    d = mat.shape[-1]
    return jnp.broadcast_to(jnp.eye(d, dtype=mat.dtype), mat.shape)


def stable_solve(A, B, *, rcond=None):
    """Solve ``A X = B`` batched, falling back to pinv for singular ``A``.

    A (..., D, D), B (..., D, E) -> X (..., D, E).
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    direct = jnp.linalg.solve(A, B)
    pinv = jnp.linalg.pinv(A, rcond=rcond) @ B
    # isfinite on complex checks both real and imaginary parts.
    bad = ~jnp.all(jnp.isfinite(direct), axis=(-2, -1), keepdims=True)
    return jnp.where(bad, pinv, direct)


def schur_inverse_and_logdet(M, *, precision=None):
    """Batched Hermitian-PD inverse + log|M| via recursive 2x2-block Schur
    complements — batched matmuls only, no triangular solves.

    XLA's batched Cholesky + triangular-solve path is built from
    inherently sequential custom calls and measured as ~half the cacGMM
    EM cost on a v5e chip for the (513 x 5, 24, 24) batches this pipeline
    inverts every EM iteration.  The Schur recursion

        inv([[A, B], [Bh, D]]) = [[Ai + Ai B Si Bh Ai, -Ai B Si],
                                  [-Si Bh Ai,            Si]],
        S = D - Bh Ai B,   log|M| = log|A| + log|S|

    (A, S Hermitian PD whenever M is) bottoms out at closed-form 1x1/2x2
    inverses, so the whole thing is ~log2(D) levels of einsums that XLA
    fuses and batches freely.  The caller must ensure positive
    definiteness (diagonal loading) — there is no pivoting.

    M (..., D, D) complex -> (inverse (..., D, D), logdet (...,) real).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    M = jnp.asarray(M)
    d = M.shape[-1]
    rdtype = M.real.dtype
    tiny = jnp.finfo(rdtype).tiny

    if d == 1:
        diag = M[..., 0, 0].real
        safe = jnp.maximum(diag, tiny)
        inv = (1.0 / safe).astype(M.dtype)[..., None, None]
        return inv, jnp.log(safe)
    if d == 2:
        a = M[..., 0, 0].real
        c = M[..., 1, 1].real
        b = M[..., 0, 1]
        # relative determinant floor: float32 cancellation can drive the
        # HPD determinant <= 0 once the local condition number exceeds
        # 1/eps; flooring at ~8 eps * a * c bounds the leaf condition
        # number instead of producing inf/NaN downstream
        floor = jnp.maximum(8 * jnp.finfo(rdtype).eps * a * c, tiny)
        det = jnp.maximum(a * c - (b * b.conj()).real, floor)
        inv_det = (1.0 / det).astype(M.dtype)
        inv = jnp.stack([
            jnp.stack([c.astype(M.dtype), -b], axis=-1),
            jnp.stack([-b.conj(), a.astype(M.dtype)], axis=-1),
        ], axis=-2) * inv_det[..., None, None]
        return inv, jnp.log(det)

    h = d // 2
    A = M[..., :h, :h]
    B = M[..., :h, h:]
    D_blk = M[..., h:, h:]

    Ai, logdet_a = schur_inverse_and_logdet(A, precision=precision)
    AiB = jnp.matmul(Ai, B, precision=precision)
    S = D_blk - jnp.matmul(B.conj().swapaxes(-2, -1), AiB,
                           precision=precision)
    S = hermitize(S)
    Si, logdet_s = schur_inverse_and_logdet(S, precision=precision)

    AiB_Si = jnp.matmul(AiB, Si, precision=precision)
    top_left = Ai + jnp.matmul(AiB_Si, AiB.conj().swapaxes(-2, -1),
                               precision=precision)
    top_right = -AiB_Si
    bottom_left = top_right.conj().swapaxes(-2, -1)
    inv = jnp.concatenate([
        jnp.concatenate([top_left, top_right], axis=-1),
        jnp.concatenate([bottom_left, Si], axis=-1),
    ], axis=-2)
    return hermitize(inv), logdet_a + logdet_s


def stable_cholesky(mat, *, eps_scale=1e-6):
    """Cholesky of a Hermitian PSD matrix with trace-scaled diagonal jitter.

    The jitter ``eps_scale * trace(mat) / D`` keeps the factorization
    well-conditioned for the nearly-singular noise PSDs that occur when a
    mask is almost everywhere zero at some frequency (same conditioning role
    as pb_bss's trace normalization + eps, reference SURVEY.md section 2.9).
    """
    d = mat.shape[-1]
    tr = jnp.trace(mat, axis1=-2, axis2=-1).real
    scale = jnp.maximum(tr / d, jnp.finfo(tr.dtype).tiny)
    jitter = (eps_scale * scale)[..., None, None] * eye_like(mat)
    return jnp.linalg.cholesky(hermitize(mat) + jitter)
