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
