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

__all__ = [
    'hermitize', 'stable_solve', 'stable_cholesky', 'eye_like',
    'gauss_jordan_inverse_and_logdet',
    'block_gauss_jordan_inverse_and_logdet', 'hermitian_solve',
    'dominant_eigenvector', 'schur_inverse_and_logdet',
]


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


def gauss_jordan_inverse_and_logdet(M):
    """Batched unpivoted Gauss-Jordan inverse + log|M|.

    Matmul/elementwise primitives only — no LAPACK-style custom calls.
    This matters twice on TPU: (a) the axon backend provides no
    cholesky/LU/eig custom calls at all, and (b) even where XLA has them,
    the batched (..., D, D) factorizations serialize, while each of the D
    pivot steps here is one fused rank-1 update the VPU runs across the
    whole batch at once (the VERDICT r1 "2-D batch layout" idea, realized
    in plain XLA).

    No pivoting: the caller must supply a (jittered) Hermitian
    positive-definite matrix, whose pivots are the positive diagonal
    Schur complements — the case where unpivoted elimination is stable.

    M (..., D, D) -> (inverse (..., D, D), logdet (...,) real).
    """
    M = jnp.asarray(M)
    d = M.shape[-1]
    rdtype = M.real.dtype
    tiny = jnp.finfo(rdtype).tiny
    idx = jnp.arange(d)

    # Pivot floor RELATIVE to the matrix scale, not absolute tiny: for an
    # HPD input, a pivot below maxdiag * eps is pure rounding noise (the
    # true Schur pivot is positive), and clamping it at tiny would make
    # inv_piv ~ 8.5e37 whose rank-1 update overflows float32 to inf and
    # NaNs the rest of the elimination.  The relative floor keeps the
    # inverse <= ~1/(maxdiag * eps): large, finite, and the right
    # magnitude for an effectively singular direction.
    diag0 = jnp.einsum('...ii->...i', M).real
    pivfloor = jnp.maximum(
        jnp.max(diag0, axis=-1) * jnp.finfo(rdtype).eps, tiny)

    def body(p, carry):
        A, logdet = carry
        # One-hot mask-and-reduce extraction, NOT lax.dynamic_index_in_dim:
        # a traced-index gather costs ~70 ms per occurrence on the axon
        # TPU runtime, while the masked sum is exact (single nonzero term)
        # and fuses into the surrounding elementwise work on the VPU.
        ec = (idx == p).astype(A.dtype)
        row = jnp.sum(A * ec[:, None], axis=-2)
        col = jnp.sum(A * ec[None, :], axis=-1)
        pivot = jnp.sum(row * ec, axis=-1)
        safe = jnp.where(jnp.abs(pivot) > pivfloor, pivot,
                         pivfloor.astype(A.dtype))
        inv_piv = 1.0 / safe
        rown = row * inv_piv[..., None]                       # (..., d)
        # Rank-1 elimination zeroes row p and column p entirely
        # (col[p] == pivot and rown[p] == 1), then the one-hot fixups
        # write the inverse's row/column p in their place.
        A = A - col[..., :, None] * rown[..., None, :]
        e = idx == p
        rowfix = jnp.where(e, inv_piv[..., None], rown)
        colfix = jnp.where(e, jnp.zeros((), A.dtype),
                           -col * inv_piv[..., None])
        A = (A
             + e.astype(A.dtype)[:, None] * rowfix[..., None, :]
             + colfix[..., :, None] * e.astype(A.dtype)[None, :])
        logdet = logdet + jnp.log(jnp.maximum(pivot.real, pivfloor))
        return A, logdet

    inv, logdet = jax.lax.fori_loop(
        0, d, body, (M, jnp.zeros(M.shape[:-2], rdtype)), unroll=8)
    return inv, logdet


def block_gauss_jordan_inverse_and_logdet(M, *, block=32, precision=None):
    """Blocked unpivoted Gauss-Jordan inverse + log|M| for large Hermitian
    PD matrices: the same elimination order as
    :func:`gauss_jordan_inverse_and_logdet`, but D/block pivot steps whose
    rank-``block`` updates are batched matmuls on the MXU instead of D
    rank-1 VPU updates — ~block x less HBM traffic over the (..., D, D)
    operand.

    Unlike the log-recursive Schur-complement inverse
    (:func:`schur_inverse_and_logdet`), error does not compound through a
    hierarchy of explicit inverse compositions: on the equilibrated,
    1e-4-loaded WPE correlation matrices (highly self-correlated speech,
    cond ~1e5 in float32) the recursion overflows to ~1e33 while blocked
    GJ stays at the cond*eps level of the scalar version (measured; see
    tests/test_linalg_device.py).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    M = jnp.asarray(M)
    d = M.shape[-1]
    pad = (-d) % block
    if pad:
        # extend with an identity block: inverse extends likewise and the
        # logdet is unchanged
        eye_pad = jnp.broadcast_to(
            jnp.eye(d + pad, dtype=M.dtype)[d:, :],
            M.shape[:-2] + (pad, d + pad))
        M = jnp.concatenate([
            jnp.concatenate(
                [M, jnp.zeros(M.shape[:-2] + (d, pad), M.dtype)], axis=-1),
            eye_pad], axis=-2)
    A = M
    dp = d + pad
    logdet = jnp.zeros(M.shape[:-2], M.real.dtype)
    for j in range(dp // block):
        lo = j * block
        piv = A[..., lo:lo + block, lo:lo + block]
        inv_piv, ld = gauss_jordan_inverse_and_logdet(piv)
        logdet = logdet + ld
        col = A[..., :, lo:lo + block]                    # (..., d, b)
        row = A[..., lo:lo + block, :]                    # (..., b, d)
        rown = jnp.matmul(inv_piv, row, precision=precision)
        # The rank-b update zeroes block row/column j exactly (see the
        # scalar version); the fixups then write the inverse's blocks.
        A = A - jnp.matmul(col, rown, precision=precision)
        rowfix = rown.at[..., :, lo:lo + block].set(inv_piv)
        colfix = -jnp.matmul(col, inv_piv, precision=precision)
        colfix = colfix.at[..., lo:lo + block, :].set(
            jnp.zeros((), A.dtype))
        A = A.at[..., lo:lo + block, :].set(rowfix)
        A = A.at[..., :, lo:lo + block].add(colfix)
    if pad:
        A = A[..., :d, :d]
    return A, logdet


def _cholesky_panels(A, *, block=32, precision=None):
    """Blocked lower-Cholesky factorization, returned as raw column
    panels (see :func:`blocked_cholesky` for the algorithm notes).

    A (..., d, d) -> (col_blocks, inv_blocks, d, pad): ``col_blocks[j]``
    is the (..., dp - j*block, block) panel [L11; L21] of block column
    j (dp = d + pad), ``inv_blocks[j]`` is inv(L11_j).  Keeping the
    factor in panel form lets the substitution consume it directly —
    assembling the full L only to slice the very same blocks back out
    costs an extra (..., d, d) write + read.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    A = jnp.asarray(A)
    d = A.shape[-1]
    rdtype = A.real.dtype
    tiny = jnp.finfo(rdtype).tiny

    pad = (-d) % block
    if pad:
        # pad with an identity block: its Cholesky factor is itself and it
        # does not couple to the leading d x d problem
        A = jnp.concatenate([
            jnp.concatenate(
                [A, jnp.zeros(A.shape[:-2] + (d, pad), A.dtype)], axis=-1),
            jnp.concatenate(
                [jnp.zeros(A.shape[:-2] + (pad, d), A.dtype),
                 jnp.broadcast_to(jnp.eye(pad, dtype=A.dtype),
                                  A.shape[:-2] + (pad, pad))], axis=-1),
        ], axis=-2)
    dp = d + pad
    nb = dp // block

    # Pivot floor RELATIVE to the matrix scale (same rationale as
    # gauss_jordan_inverse_and_logdet): eps^2 * maxdiag, not an absolute
    # eps^2, so legitimately tiny-scale HPD inputs are not silently
    # mis-factorized (ADVICE r3).  maxdiag is taken from the ORIGINAL
    # diagonal — for HPD inputs the Schur-complement diagonals only
    # shrink, so one floor serves every panel.
    diag0 = jnp.einsum('...ii->...i', A).real
    pivfloor = jnp.maximum(
        jnp.max(diag0, axis=-1) * jnp.finfo(rdtype).eps ** 2, tiny)

    def factor_panel(panel):
        """panel (..., b, b): the diagonal pivot block.  b rank-1 steps
        produce its Cholesky factor L11 AND inv(L11), built row-by-row in
        the same loop (row p of the triangular inverse only needs rows
        < p: one masked matvec per step).  Sequential loop steps cost
        ~65 us of runtime overhead each on this backend regardless of the
        arithmetic, so the triangular inverse rides along for free instead
        of paying for a second loop; everything below/right of the pivot
        block is batched MXU matmuls outside."""
        b = panel.shape[-1]
        m = panel.shape[-2]
        idx_col = jnp.arange(b)
        idx_row = jnp.arange(m)

        def step(p, carry):
            P, Inv = carry
            # one-hot extraction, not dynamic_index_in_dim (see
            # gauss_jordan_inverse_and_logdet)
            ec = (idx_col == p).astype(P.dtype)               # (b,)
            col = jnp.sum(P * ec[None, :], axis=-1)           # (..., m)
            diag = jnp.sum(
                col * (idx_row == p).astype(P.dtype), axis=-1).real
            # Relative pivot floor (eps^2 * max original diagonal), NOT
            # absolute tiny: a rounding-negative pivot clamped at tiny
            # gives 1/sqrt(tiny) ~ 9e18 whose trailing updates overflow
            # float32 to inf and NaN the factorization (observed with
            # under-regularized WPE statistics); the relative floor
            # keeps the multipliers <= ~1/eps of the matrix scale —
            # large, finite, graceful.
            rpiv = jnp.sqrt(jnp.maximum(diag, pivfloor))
            # rows above the pivot inside the pivot block hold stale
            # already-eliminated values; masking them out of lcol keeps
            # them from feeding back into the updates (they would grow
            # geometrically over the b steps and overflow float32)
            lcol = jnp.where(idx_row >= p, col, jnp.zeros((), P.dtype)) \
                / rpiv[..., None].astype(P.dtype)             # (..., m)
            # The column-q multiplier is conj(L[q, p]) = conj(lcol[q]).
            # Crucially it is taken from lcol (the lower triangle), NOT
            # from the pivot row: a 1-ulp Hermitian asymmetry in the input
            # (the equilibration divisions round differently for (i,j) and
            # (j,i)) otherwise feeds back through the small pivots and
            # grows geometrically — measured 0.135 reconstruction error on
            # WPE statistics even in float64.  Lower-triangle-only
            # dataflow is what makes unpivoted Cholesky backward stable.
            rowm = lcol[..., :b].conj()                       # (..., b)
            mask_after = (idx_col > p).astype(P.dtype)        # (b,)
            P = P - lcol[..., :, None] * (rowm * mask_after)[..., None, :]
            P = P * (1 - ec)[None, :] + lcol[..., :, None] * ec[None, :]
            # triangular-inverse row p: (e_p - L[p, :p] @ Inv) / l_pp.
            # Columns 0..p of P now hold final L columns, so L[p, :p] is
            # one masked row extraction; rows >= p of Inv are still zero.
            er = (idx_row == p).astype(P.dtype)               # (m,)
            lrow = jnp.sum(P[..., :b, :] * er[:b, None], axis=-2) \
                * (idx_col < p).astype(P.dtype)               # (..., b)
            inv_row = (ec - jnp.sum(lrow[..., :, None] * Inv, axis=-2)) \
                / rpiv[..., None].astype(P.dtype)
            Inv = Inv * (1 - ec)[:, None] + ec[:, None] * inv_row[..., None, :]
            return P, Inv

        inv0 = jnp.zeros(panel.shape[:-2] + (b, b), panel.dtype)
        return jax.lax.fori_loop(0, b, step, (panel, inv0), unroll=8)

    tri = jnp.tril(jnp.ones((block, block), bool))
    zero = jnp.zeros((), A.dtype)
    col_blocks = []      # j-th entry: (..., dp - j*block, block) = [L11; L21]
    inv_blocks = []
    trailing = A         # shrinking Schur complement — no full-matrix
    #                      .at updates (each would copy the whole buffer)
    for j in range(nb):
        L11, Inv11 = factor_panel(trailing[..., :block, :block])
        L11 = jnp.where(tri, L11, zero)
        Inv11 = jnp.where(tri, Inv11, zero)
        inv_blocks.append(Inv11)
        if j < nb - 1:
            # L21 = A21 L11^{-H}: one batched MXU matmul instead of a
            # b-step column substitution over the whole panel
            L21 = jnp.matmul(trailing[..., block:, :block],
                             Inv11.conj().swapaxes(-2, -1),
                             precision=precision)
            col_blocks.append(jnp.concatenate([L11, L21], axis=-2))
            trailing = trailing[..., block:, block:] - jnp.matmul(
                L21, L21.conj().swapaxes(-2, -1), precision=precision)
        else:
            col_blocks.append(L11)
    return col_blocks, inv_blocks, d, pad


def blocked_cholesky(A, *, block=32, precision=None,
                     _return_block_inverses=False):
    """Blocked lower-Cholesky factorization of batched Hermitian PD
    matrices — no LAPACK custom call.

    Right-looking blocked algorithm: each (m, b) panel (pivot block plus
    the rows below it) is factorized by a ``fori_loop`` of b rank-1 steps,
    and the rank-b trailing update is one batched matmul on the MXU.  No
    explicit inverse is ever formed during factorization — unlike the
    full-block-inverse composition of block-GJ, which loses
    cond(block)*eps per panel (measured catastrophic on WPE statistics),
    this is numerically standard unpivoted Cholesky, backward stable for
    HPD.

    A (..., d, d) -> lower-triangular L with A = L L^H.  Entries above the
    diagonal are zeroed.  The caller must ensure positive definiteness
    (diagonal loading); non-PD pivots are floored at
    ``eps^2 * max(diag(A))`` per matrix (scale-relative, so tiny-scale
    HPD inputs factorize correctly too), producing large but finite
    results.
    """
    A = jnp.asarray(A)
    col_blocks, inv_blocks, d, pad = _cholesky_panels(
        A, block=block, precision=precision)
    # assemble L from the column blocks (one concatenate per block column)
    cols = []
    for j, cb in enumerate(col_blocks):
        top = jnp.zeros(A.shape[:-2] + (j * block, block), A.dtype)
        cols.append(jnp.concatenate([top, cb], axis=-2) if j else cb)
    L = jnp.concatenate(cols, axis=-1)
    if pad:
        L = L[..., :d, :d]
    if _return_block_inverses:
        return L, inv_blocks
    return L


def _solve_from_panels(col_blocks, inv_blocks, B, *, precision=None):
    """Solve ``L L^H X = B`` directly from the factor's column panels —
    no assembled L, and the forward/backward substitutions build their
    solution block lists with small concatenates instead of whole-buffer
    ``.at[].set`` updates.

    col_blocks[j] (..., dp - j*block, block), B (..., d, e) -> (..., d, e)
    (B is zero-extended to dp rows internally; the padded rows solve the
    identity block and are dropped).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    B = jnp.asarray(B)
    nb = len(col_blocks)
    block = col_blocks[0].shape[-1]
    d = B.shape[-2]
    dp = nb * block

    if dp > d:
        B = jnp.concatenate([
            B, jnp.zeros(B.shape[:-2] + (dp - d, B.shape[-1]), B.dtype)],
            axis=-2)

    # forward: L Y = B, one solved block per panel
    ys = []
    for j in range(nb):
        lo = j * block
        rhs = B[..., lo:lo + block, :]
        if j:
            # L[lo:lo+b, :lo] = rows (lo - lo_k) of each earlier panel
            lrow = jnp.concatenate([
                col_blocks[k][..., lo - k * block:lo - k * block + block, :]
                for k in range(j)], axis=-1)               # (..., b, lo)
            rhs = rhs - jnp.matmul(lrow, jnp.concatenate(ys, axis=-2),
                                   precision=precision)
        ys.append(jnp.matmul(inv_blocks[j], rhs, precision=precision))

    # backward: L^H X = Y
    xs = [None] * nb
    for j in reversed(range(nb)):
        rhs = ys[j]
        if j < nb - 1:
            # L[lo+b:, lo:lo+b]^H = col_blocks[j][b:]^H
            below = col_blocks[j][..., block:, :]
            rhs = rhs - jnp.matmul(
                below.conj().swapaxes(-2, -1),
                jnp.concatenate(xs[j + 1:], axis=-2), precision=precision)
        xs[j] = jnp.matmul(
            inv_blocks[j].conj().swapaxes(-2, -1), rhs,
            precision=precision)
    X = jnp.concatenate(xs, axis=-2)
    return X[..., :d, :]


def blocked_cholesky_solve(L, B, *, block=32, precision=None,
                           inv_diag=None):
    """Solve ``L L^H X = B`` given the blocked-Cholesky factor ``L`` —
    blocked forward then backward substitution, each diagonal block
    applied by a small inverse (scalar Gauss-Jordan of the (b, b)
    triangle) and the off-diagonal coupling by batched matmuls.

    L (..., d, d) lower, B (..., d, e) -> X (..., d, e).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    L = jnp.asarray(L)
    B = jnp.asarray(B)
    d = L.shape[-1]
    nb = -(-d // block)

    # Invert the diagonal blocks (triangular, well-conditioned after
    # equilibration) in ONE batched scalar-GJ call — stacking the nb
    # blocks on a new axis turns nb sequential b-step loops into one
    if inv_diag is None:
        blks = []
        for j in range(nb):
            lo = j * block
            hi = min(lo + block, d)
            blk = L[..., lo:hi, lo:hi]
            if hi - lo < block:
                blk_full = jnp.broadcast_to(
                    jnp.eye(block, dtype=L.dtype),
                    L.shape[:-2] + (block, block))
                blk = blk_full.at[..., :hi - lo, :hi - lo].set(blk)
            blks.append(blk)
        inv_stack, _ = gauss_jordan_inverse_and_logdet(
            jnp.stack(blks, axis=0))
        inv_diag = [inv_stack[j] for j in range(nb)]

    # forward: L Y = B
    Y = jnp.zeros_like(B)
    for j in range(nb):
        lo = j * block
        hi = min(lo + block, d)
        rhs = B[..., lo:hi, :] - jnp.matmul(
            L[..., lo:hi, :lo], Y[..., :lo, :], precision=precision) \
            if lo else B[..., lo:hi, :]
        yj = jnp.matmul(inv_diag[j][..., :hi - lo, :hi - lo], rhs,
                        precision=precision)
        Y = Y.at[..., lo:hi, :].set(yj)

    # backward: L^H X = Y
    X = jnp.zeros_like(B)
    for j in reversed(range(nb)):
        lo = j * block
        hi = min(lo + block, d)
        rhs = Y[..., lo:hi, :]
        if hi < d:
            rhs = rhs - jnp.matmul(
                L[..., hi:, lo:hi].conj().swapaxes(-2, -1),
                X[..., hi:, :], precision=precision)
        xj = jnp.matmul(
            inv_diag[j][..., :hi - lo, :hi - lo].conj().swapaxes(-2, -1),
            rhs, precision=precision)
        X = X.at[..., lo:hi, :].set(xj)
    return X


def hermitian_solve(A, B, *, relative_load=None, method=None,
                    precision=None, refine: int = 0):
    """Solve ``A X = B`` for Hermitian (PSD) ``A`` without custom calls.

    Equilibrates ``A`` to unit diagonal, adds ``relative_load`` on that
    diagonal (default ``64 * eps(dtype)`` — parity-preserving in float64,
    conditioning-bounding in float32), inverts with unpivoted Gauss-Jordan
    (scalar pivots for D <= 32, blocked MXU pivot steps above), and applies
    the inverse to ``B``.

    ``refine > 0`` runs that many iterative-refinement steps: the residual
    ``r = B - A X`` is computed against the ORIGINAL (unloaded) matrix and
    corrected through the already-factored loaded one
    (``X += (A + load)^{-1} r``) — the classical way to keep a stabilizing
    load while converging to the unregularized solution.  Each step costs
    two (d, e)-shaped matmuls (one residual, one apply); the factorization
    is reused.  Convergence caveat: the bias in an eigenmode with
    eigenvalue ``sigma`` (of the equilibrated ``A``) contracts by
    ``load / (sigma + load)`` per step, so refinement is fast exactly
    where ``sigma >> load`` and useless for near-null modes — it cannot
    substitute for the load on genuinely ill-conditioned systems
    (measured: docs/ARCHITECTURE.md round-4 ledger, WPE solve
    refinement).

    A (..., D, D), B (..., D, E) -> X (..., D, E).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    d = A.shape[-1]
    rdtype = A.real.dtype
    tiny = jnp.finfo(rdtype).tiny
    if relative_load is None:
        relative_load = 64 * jnp.finfo(rdtype).eps

    diag = jnp.diagonal(A, axis1=-2, axis2=-1).real
    # Floor the equilibration scales relative to the largest diagonal
    # entry: an exactly-zero row/column (silent channel / empty mask)
    # otherwise gets a ~1/sqrt(tiny) scale whose square overflows.  For a
    # healthy HPD matrix the floor is inactive.  An all-zero matrix skips
    # equilibration entirely (any finite answer is arbitrary there).
    maxdiag = jnp.max(diag, axis=-1, keepdims=True)
    floor = jnp.where(maxdiag > 0, maxdiag * jnp.finfo(rdtype).eps, 1.0)
    s = jnp.sqrt(jnp.maximum(diag, floor))
    sinv = (1.0 / s).astype(A.dtype)
    As0 = hermitize(A * sinv[..., :, None] * sinv[..., None, :])
    As = As0 + jnp.asarray(relative_load, A.dtype) * jnp.eye(d, dtype=A.dtype)
    Bs = sinv[..., :, None] * B
    if method is None:
        # scalar GJ's D rank-1 VPU steps win for small matrices; blocked
        # Cholesky (MXU trailing updates, no explicit inverses — backward
        # stable) wins above
        method = 'gj' if d <= 32 else 'chol'
    if method == 'chol':
        col_blocks, invs, _, _ = _cholesky_panels(As, precision=precision)

        def apply_inv(rhs):
            return _solve_from_panels(col_blocks, invs, rhs,
                                      precision=precision)
    else:
        if method == 'gj':
            inv, _ = gauss_jordan_inverse_and_logdet(As)
        elif method == 'block_gj':
            # faster but less accurate than 'gj' on ill-conditioned inputs
            # (the explicit block-pivot inverses compose cond(piv)*eps
            # errors); fine for well-conditioned matrices
            inv, _ = block_gauss_jordan_inverse_and_logdet(
                As, precision=precision)
        elif method == 'schur':
            # research option only: overflows in float32 on highly
            # self-correlated statistics (see block_gauss_jordan docstring)
            inv, _ = schur_inverse_and_logdet(As, precision=precision)
        else:
            raise ValueError(method)

        def apply_inv(rhs):
            return jnp.matmul(inv, rhs, precision=precision)

    X = apply_inv(Bs)
    for _ in range(refine):
        # residual against the UNLOADED equilibrated matrix: the
        # correction removes the O(load) bias, not just roundoff
        r = Bs - jnp.matmul(As0, X, precision=precision)
        X = X + apply_inv(r)
    return sinv[..., :, None] * X


def dominant_eigenvector(M, *, squarings=14, power_steps=2,
                         precision=None):
    """Dominant eigenvector of a batched matrix with a real non-negative
    spectrum (Hermitian PSD, or a product ``N^{-1} Phi`` of two HPSDs),
    by repeated squaring — matmuls only, no eig custom call.

    ``squarings`` doublings give convergence ratio
    ``(lambda_2 / lambda_1) ** (2 ** squarings)``; 14 squarings drive any
    ratio below ~0.995 to float64 roundoff.  The result is normalized to
    unit 2-norm with the first component's phase rotated real-positive
    (the arbitrary-phase convention the beamformers use).

    M (..., D, D) -> (..., D).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    M = jnp.asarray(M)
    rdtype = M.real.dtype
    tiny = jnp.finfo(rdtype).tiny

    def renorm(A):
        scale = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
        return A / jnp.maximum(scale, tiny).astype(A.dtype)

    def square(_, A):
        return renorm(jnp.matmul(A, A, precision=precision))

    P = jax.lax.fori_loop(0, squarings, square, renorm(M))
    # Any non-null column of M^(2^k) lies in the dominant eigenspace; pick
    # the largest one, then polish with a few ordinary power steps to
    # shrink the contamination the finite squaring left behind.
    norms = jnp.linalg.norm(P, axis=-2)
    pick = jnp.argmax(norms, axis=-1)
    # one-hot mask-and-reduce, NOT take_along_axis: a traced-index
    # gather costs ~10-70 ms on the axon runtime (measured 16 ms for
    # the analogous target-mask gather in models/gss.py)
    onehot = (jnp.arange(P.shape[-1]) == pick[..., None]).astype(P.dtype)
    v = jnp.sum(P * onehot[..., None, :], axis=-1)

    def power(_, v):
        v = jnp.einsum('...de,...e->...d', M, v, precision=precision)
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, tiny).astype(v.dtype)

    v = jax.lax.fori_loop(0, power_steps, power, power(0, v))
    if jnp.iscomplexobj(v):
        phase = jnp.exp(-1j * jnp.angle(v[..., :1])).astype(v.dtype)
        v = v * phase
    else:
        v = v * jnp.sign(jnp.where(v[..., :1] == 0, 1.0, v[..., :1]))
    return v


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
