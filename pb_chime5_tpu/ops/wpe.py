"""Weighted prediction error (WPE) dereverberation, batched over frequency.

Rebuilds the capability of nara_wpe.wpe.wpe_v8 as driven by the reference
WPE block (pb_chime5/core.py:41-88): iterative block (offline) WPE with

* time-varying power estimate  lambda_t = mean_d |X_dt|^2, optionally
  smoothed over +-``psd_context`` frames, floored at
  1e-10 * max_t(lambda) (scale-invariant),
* stacked delayed observations  Ytilde_t = [Y_{t-delay}, ...,
  Y_{t-delay-taps+1}] in C^{taps*D} (zero-padded history,
  "full" statistics mode),
* correlation statistics  R = sum_t Ytilde Ytilde^H / lambda_t,
  P = sum_t Ytilde Y_t^H / lambda_t,
* filter  G = R^{-1} P  (Hermitian solve with pinv fallback),
* output  X_t = Y_t - G^H Ytilde_t.

The reference runs this per frequency inside nara_wpe (already batched over
F there); here the whole thing is a single jitted program: the T
contractions are (taps*D, T) x (T, taps*D) matmuls batched over F on the
MXU, and the iteration loop is a ``lax.fori_loop``.

The production statistics formulation (``stats_backend='real'``, the
'auto' default) computes R in real arithmetic with the Hermitian
structure exploited: real(R) as symmetric tap-group-blocked Grams
(strictly-upper blocks mirrored, not computed) and imag(R) as A - A^T
from one full real product — 25% less statistics MXU work than the
4-real-dot lowering of the complex einsums, with bitwise-identical
products (see :func:`_real_form_stats`).  Measured v5e headline shape:
stft+wpe(3) 261 -> 239 ms (stationary) / 256 -> 243 ms (bench scene).

A ``frame_mask`` argument supports padded utterance batches: padded frames
are excluded from the statistics (their Ytilde columns are zero) and the
output is zero there.
"""

import functools

import jax
import jax.numpy as jnp

# MXU precision of the statistics/tail contractions (the solve internals
# are always HIGHEST).  Measured dead end — keep 'highest':
#   * On a stationary scene (F=513, D=24, taps=10, T=2503;
#     scripts_dev/bench_wpe_precision.py) HIGH (3-pass bf16) looked
#     attractive: 238 vs 254 ms stft+wpe(3), rel 1.3e-3.
#   * On a REALISTIC envelope-modulated scene (the bench scene, with
#     near-silent stretches, inv_power spanning ~1e10) HIGH NaNs the
#     WPE output outright (30.7M non-finite entries): the ~1e-3 bf16
#     statistics noise exceeds the 1e-4 diagonal load 13x and breaks
#     positive-definiteness of the weighted correlation matrices.
#   * Tail-only HIGH (statistics kept at HIGHEST) is finite (rel
#     5.3e-4) but saves NOTHING (251.3 vs 250.9 ms): the tail einsum
#     is HBM-bound, not MXU-bound, so cheaper MXU passes don't show.
#   * DEFAULT (1-pass bf16) NaNs even on the stationary scene.
# The knob below is kept for experimentation; the production default is
# 'highest' everywhere.
_HIGHEST = jax.lax.Precision.HIGHEST
_PRECISIONS = {
    'highest': jax.lax.Precision.HIGHEST,
    'high': jax.lax.Precision.HIGH,
    'default': jax.lax.Precision.DEFAULT,
}

from pb_chime5_tpu.ops.linalg import (
    hermitize, hermitian_solve, stable_solve)

__all__ = ['wpe', 'build_y_tilde', 'get_power_inverse']


def build_y_tilde(Y, taps: int, delay: int):
    """Y (..., D, T) -> Ytilde (..., taps * D, T).

    Row block ``tau`` (tau = 0..taps-1) of Ytilde_t is Y_{t - delay - tau},
    zero for negative time indices.
    """
    parts = []
    T = Y.shape[-1]
    for tau in range(taps):
        shift = delay + tau
        pad_width = [(0, 0)] * (Y.ndim - 1) + [(shift, 0)]
        parts.append(jnp.pad(Y, pad_width)[..., :T])
    return jnp.concatenate(parts, axis=-2)


def get_power_inverse(X, psd_context: int = 0, frame_mask=None):
    """Inverse time-varying power:  1 / max(lambda, 1e-10 * max(lambda)).

    X (..., D, T) -> (..., T).  ``psd_context`` averages lambda over a
    +-context frame window (matching nara_wpe's get_power context
    smoothing).
    """
    power = jnp.mean(jnp.abs(X) ** 2, axis=-2)
    if psd_context > 0:
        width = 2 * psd_context + 1
        kernel = jnp.ones((width,), dtype=power.dtype)
        pad = [(0, 0)] * (power.ndim - 1) + [(psd_context, psd_context)]
        padded = jnp.pad(power, pad)
        counts = jnp.convolve(jnp.ones(power.shape[-1], power.dtype),
                              kernel, mode='full')[
            psd_context:psd_context + power.shape[-1]]
        smoothed = jax.vmap(
            lambda p: jnp.convolve(p, kernel, mode='valid'),
        )(padded.reshape(-1, padded.shape[-1]))
        power = smoothed.reshape(power.shape) / counts
    if frame_mask is not None:
        power = power * frame_mask.astype(power.dtype)
    floor = 1e-10 * jnp.max(power, axis=-1, keepdims=True)
    floor = jnp.maximum(floor, jnp.finfo(power.dtype).tiny)
    return 1.0 / jnp.maximum(power, floor)


def _tap_groups(taps: int, D: int, lane: int = 128):
    """Split the ``taps`` delay taps into contiguous groups whose stacked
    row count (group_taps * D) stays <= ``lane`` where possible.

    The real-form statistics backend computes the correlation Gram on
    tap-group strips: strip boundaries at multiples of D mean the strips
    can be BUILT directly (no row-slicing of a materialized (taps*D, T)
    stack), and group row counts close to the 128-lane MXU tile keep the
    padding waste of the blocked dots at the same ~7% as the full Gram's
    240 -> 256.  For D=24, taps=10 (production): two strips of 5 taps =
    120 rows each.
    """
    per = max(1, lane // D)
    groups = [range(s, min(s + per, taps)) for s in range(0, taps, per)]
    return groups


def _build_strip(Yp, group, delay: int):
    """Stacked delayed rows for one tap group: (..., len(group)*D, T).

    Same semantics as :func:`build_y_tilde` restricted to taps in
    ``group`` (``Yp`` real or complex).
    """
    T = Yp.shape[-1]
    parts = []
    for tau in group:
        shift = delay + tau
        pad_width = [(0, 0)] * (Yp.ndim - 1) + [(shift, 0)]
        parts.append(jnp.pad(Yp, pad_width)[..., :T])
    return jnp.concatenate(parts, axis=-2)


def _assemble_blocks(blocks):
    """blocks[i][j] (F, r_i, c_j) -> (F, sum r_i, sum c_j)."""
    return jnp.concatenate(
        [jnp.concatenate(row, axis=-1) for row in blocks], axis=-2)


def _real_form_stats(U, V, Yr, Yi, inv_power, precision):
    """Weighted WPE correlation statistics in real arithmetic with the
    Hermitian structure exploited.

    U / V: lists of real/imaginary tap-group strips of the stacked
    delayed signal (each (F, r_g, T), frame mask already applied);
    Yr / Yi: (F, D, T) real/imag of the observation; inv_power: (F, T).
    Returns (R, P) complex with R EXACTLY Hermitian by construction.

    Math:  R = Ytilde diag(w) Ytilde^H  with  Ytilde = U + iV, real w:
      real(R) = U w U^T + V w V^T   (symmetric),
      imag(R) = V w U^T - (V w U^T)^T   (antisymmetric).
    XLA lowers a complex dot to the same four real dots (measured:
    complex (240,240) Gram = 4x the real-dot roofline at HIGHEST), so
    every computed product and its accumulation order is identical to
    the complex einsum path — computed entries are bitwise equal, and
    mirrored entries are bitwise equal to their transposed partner
    (exact Hermitian-ness replaces :func:`hermitize`).

    The MXU win is the symmetric part: the lower-triangular tap-group
    blocks B_ij = U_i w U_j^T + V_i w V_j^T (i >= j) are computed and
    the strictly-upper blocks mirrored, saving the strictly-upper dots
    (25% of the stats MXU at the production 2-strip split; the
    antisymmetric part needs all blocks).  Measured on v5e (headline
    shape, scripts_dev/bench_wpe_stats_form.py): stats 27.8 ->
    ~21 ms/iteration.

    P is folded into the staircase columns rather than computed as
    standalone (r_i, T) x (T, D) dots: at D = 24 those dots pad 24 ->
    128 lanes and cost ~3.4x their FLOP share (round-3 shape microbench,
    scripts_dev/bench_gram_shapes.py); riding the existing dots'
    padding removes most of that (scripts_dev/bench_p_form.py).
    """
    w = inv_power
    Uw = [u * w[:, None, :].astype(u.dtype) for u in U]
    Vw = [v * w[:, None, :].astype(v.dtype) for v in V]
    n = len(U)
    D = Yr.shape[-2]

    def dot(a, b):
        return jnp.einsum('fit,fjt->fij', a, b, precision=precision)

    # symmetric real part: lower blocks only, mirror the rest.  The
    # last diagonal block is computed below with P's columns folded in.
    lower = {}
    for i in range(n):
        for j in range(i + 1):
            if i == j == n - 1:
                continue
            lower[(i, j)] = dot(Uw[i], U[j]) + dot(Vw[i], V[j])

    # The cross-correlation vector P rides inside the staircase
    # (measured on v5e, headline shape, scripts_dev/bench_p_form.py:
    # stats 59.6 -> 53.3 ms/pass; folding BOTH diagonal blocks is
    # slower, 56.1 ms — the second 168-col operand pads 128 -> 256):
    # the right operands of the LAST diagonal block's dots are extended
    # with the observation planes, so strip n-1's P columns ride inside
    # those dots' lane padding, and each remaining strip's P is one
    # concatenated [Yr|Yi] dot per side (2*D = 48 cols -> a single
    # 128-lane dot instead of two).  Every output element keeps the
    # same MATHEMATICAL contraction over T, but NOT the same floating-
    # point result: the wider right operand changes the backend's
    # reduction blocking, so the accumulation order differs from the
    # standalone dots (measured: 1.4e-2 absolute on O(1)-scale WPE
    # output after 3 iterations at D=24 — rounding amplified through
    # the ill-conditioned solve; round-5 root cause of the
    # realistic-scene pin break.  The 8-seed quality distribution is
    # unchanged — median +20.0 dB with the fold vs +18.9 without — see
    # tests/test_realistic_scene.py).
    m = n - 1
    r = U[m].shape[-2]
    eU = dot(Uw[m], jnp.concatenate([U[m], Yr, Yi], axis=-2))
    eV = dot(Vw[m], jnp.concatenate([V[m], Yi, Yr], axis=-2))
    lower[(m, m)] = eU[..., :r] + eV[..., :r]
    Pr = [None] * n
    Pi = [None] * n
    Pr[m] = eU[..., r:r + D] + eV[..., r:r + D]
    Pi[m] = eV[..., r + D:] - eU[..., r + D:]
    for i in range(n - 1):
        dU = dot(Uw[i], jnp.concatenate([Yr, Yi], axis=-2))
        dV = dot(Vw[i], jnp.concatenate([Yi, Yr], axis=-2))
        Pr[i] = dU[..., :D] + dV[..., :D]
        Pi[i] = dV[..., D:] - dU[..., D:]

    rr = [[lower[(i, j)] if i >= j
           else jnp.swapaxes(lower[(j, i)], -1, -2)
           for j in range(n)] for i in range(n)]
    Rr = _assemble_blocks(rr)

    # antisymmetric imaginary part: A = V w U^T fully, then A - A^T
    A = _assemble_blocks(
        [[dot(Vw[i], U[j]) for j in range(n)] for i in range(n)])
    Ri = A - jnp.swapaxes(A, -1, -2)

    return (jax.lax.complex(Rr, Ri),
            jax.lax.complex(jnp.concatenate(Pr, axis=-2),
                            jnp.concatenate(Pi, axis=-2)))


def _real_form_tail(G, U, V, precision):
    """tail = G^H Ytilde from tap-group strips:  (F, D, T) complex.

    G (F, taps*D, D) complex filter;  U/V strips as in
    :func:`_real_form_stats`.  tail[d, t] = sum_i conj(G[i, d]) Yt[i, t]:
      real = Gr^T U + Gi^T V,   imag = Gr^T V - Gi^T U.
    """
    Gr, Gi = jnp.real(G), jnp.imag(G)
    tr = ti = 0.0
    s = 0
    for u, v in zip(U, V):
        r = u.shape[-2]
        gr, gi = Gr[:, s:s + r, :], Gi[:, s:s + r, :]
        tr = tr + jnp.einsum('fid,fit->fdt', gr, u, precision=precision) \
            + jnp.einsum('fid,fit->fdt', gi, v, precision=precision)
        ti = ti + jnp.einsum('fid,fit->fdt', gr, v, precision=precision) \
            - jnp.einsum('fid,fit->fdt', gi, u, precision=precision)
        s += r
    return jax.lax.complex(tr, ti)


def _wpe_iteration_real(Y, U, V, Yr, Yi, inv_power, regularization,
                        precision=_HIGHEST, solve_refine=0):
    """One WPE filter update in the real-form statistics backend."""
    R, P = _real_form_stats(U, V, Yr, Yi, inv_power, precision)
    G = _solve_G(R, P, regularization, inv_power.dtype,
                 refine=solve_refine)
    return Y - _real_form_tail(G, U, V, precision)


def _wpe_iteration(Y, Y_tilde, inv_power, regularization,
                   stats_backend='auto', precision=_HIGHEST,
                   solve_refine=0):
    """One WPE filter update.  Y (F, D, T), Y_tilde (F, taps*D, T),
    inv_power (F, T) -> dereverberated X (F, D, T).

    ``regularization`` selects an equilibrated, diagonally-loaded Hermitian
    solve.  The reference (nara_wpe + stable_solve) runs float64 where the
    unregularized LU solve is adequate; in float32 on TPU the
    taps*D-dimensional R is routinely ill-conditioned enough that the plain
    solve amplifies roundoff by orders of magnitude (and an unequilibrated
    Cholesky can outright fail on roundoff-indefinite R).  The default
    1e-4 loading on the unit-diagonal-scaled R bounds the condition number
    at ~1e4 with negligible effect on the prediction (documented
    deviation; set regularization=0 for reference-exact float64 behaviour).
    """
    # note: 'auto' is resolved in _wpe_impl (to the real-form backend).
    # The fused Pallas statistics kernel below is a measured dead end,
    # twice (v5e, 24ch headline): it loses to XLA even after the round-3
    # standard-form rewrite removed its hidden in-VMEM transpose
    # (333 vs 250 ms stft+wpe(3); the original dim-0/dim-0 form
    # measured 293 vs 273).  The R einsum is already AT the 6-pass
    # MXU FLOP bound in XLA, so the fusion can only recover the
    # weighted-copy HBM traffic (~3 ms/iter) and instead pays
    # per-iteration time-major plane builds.  Kept as an option
    # (and a tested example of the revisited-accumulation pattern).
    if stats_backend == 'pallas':
        # fused single-pass statistics (ops/pallas/wpe_stats.py): reads
        # the stacked signal once per tile, never writes the weighted
        # (F, taps*D, T) copy to HBM
        from pb_chime5_tpu.ops.pallas.wpe_stats import wpe_statistics
        R, P = wpe_statistics(Y_tilde, Y, inv_power)
        R = hermitize(R.astype(Y.dtype))
        P = P.astype(Y.dtype)
    else:
        weighted = Y_tilde * inv_power[:, None, :].astype(Y_tilde.dtype)
        R = hermitize(jnp.einsum('fit,fjt->fij', weighted,
                                 Y_tilde.conj(), precision=precision))
        P = jnp.einsum('fit,fjt->fij', weighted, Y.conj(),
                       precision=precision)
    G = _solve_G(R, P, regularization, inv_power.dtype,
                 refine=solve_refine)
    tail = jnp.einsum('fid,fit->fdt', G.conj(), Y_tilde,
                      precision=precision)
    return Y - tail


def _solve_G(R, P, regularization, rdtype, refine=0):
    """R G = P, equilibrated + diagonally loaded (see _wpe_iteration).

    The regularized path uses ``hermitian_solve`` (unpivoted Gauss-Jordan
    for small taps*D, blocked Cholesky on the MXU for large) —
    matmul/elementwise only, identical equilibration + loading to the
    previous formulation, but with no linalg custom calls (which the axon
    TPU backend cannot compile at all).

    ``refine`` iterative-refinement steps (residual against the UNLOADED
    R) attack the regularization bias of the diagonal load — see
    ``hermitian_solve`` for the mechanism and its measured limits (the
    per-mode contraction is sigma/(sigma+load): a 13x parity win at
    well-conditioned shapes, ~no-op at the production stress shape whose
    deviation lives in near-null modes).
    """
    if regularization:
        return hermitian_solve(R, P, relative_load=regularization,
                               refine=refine)
    return stable_solve(R, P)


def _chunked_wpe_iteration(Y, inv_power, taps, delay, regularization,
                           chunk_size, frame_mask, precision=_HIGHEST,
                           solve_refine=0):
    """One WPE update accumulating R/P over T-chunks with lax.scan.

    Never materializes the full (F, taps*D, T) stacked signal — peak
    scratch is one (F, taps*D, chunk) block.  This is what makes
    batched / very-long-utterance WPE fit in HBM.
    """
    F, D, T = Y.shape
    pad = (-T) % chunk_size
    hist = delay + taps - 1
    Yp = jnp.pad(Y, ((0, 0), (0, 0), (hist, pad)))
    wp = jnp.pad(inv_power, ((0, 0), (0, pad)))
    if frame_mask is not None:
        fmp = jnp.pad(frame_mask, (0, pad))
    num_chunks = (T + pad) // chunk_size

    def chunk_tilde(c):
        """(F, taps*D, chunk) stacked delayed block for chunk c."""
        start = c * chunk_size          # position in unpadded time
        parts = []
        for tau in range(taps):
            shift = delay + tau
            # Yp index (start + hist - shift) .. + chunk
            parts.append(jax.lax.dynamic_slice_in_dim(
                Yp, start + hist - shift, chunk_size, axis=2))
        yt = jnp.concatenate(parts, axis=1)
        if frame_mask is not None:
            m = jax.lax.dynamic_slice_in_dim(fmp, start, chunk_size, 0)
            yt = yt * m[None, None, :].astype(yt.dtype)
        return yt

    def scan_body(carry, c):
        R, P = carry
        yt = chunk_tilde(c)
        yc = jax.lax.dynamic_slice_in_dim(Yp, c * chunk_size + hist,
                                          chunk_size, axis=2)
        w = jax.lax.dynamic_slice_in_dim(wp, c * chunk_size, chunk_size, 1)
        weighted = yt * w[:, None, :].astype(yt.dtype)
        R = R + jnp.einsum('fit,fjt->fij', weighted, yt.conj(),
                           precision=precision)
        P = P + jnp.einsum('fit,fjt->fij', weighted, yc.conj(),
                           precision=precision)
        return (R, P), None

    dim = taps * D
    init = (jnp.zeros((F, dim, dim), Y.dtype),
            jnp.zeros((F, dim, D), Y.dtype))
    (R, P), _ = jax.lax.scan(scan_body, init, jnp.arange(num_chunks))
    R = hermitize(R)
    G = _solve_G(R, P, regularization, inv_power.dtype,
                 refine=solve_refine)

    def tail_body(X, c):
        yt = chunk_tilde(c)
        tail = jnp.einsum('fid,fit->fdt', G.conj(), yt,
                          precision=precision)
        return X, tail

    _, tails = jax.lax.scan(tail_body, None, jnp.arange(num_chunks))
    # tails (num_chunks, F, D, chunk) -> (F, D, T)
    tail = jnp.moveaxis(tails, 0, 2).reshape(F, D, num_chunks * chunk_size)
    return Y - tail[..., :T]


def _chunked_wpe_iteration_real(Y, inv_power, taps, delay, regularization,
                                chunk_size, frame_mask,
                                precision=_HIGHEST, solve_refine=0):
    """One real-form WPE update accumulating strip-block statistics over
    T-chunks with ``lax.scan`` (the chunked twin of
    :func:`_wpe_iteration_real`; see :func:`_real_form_stats` for the
    Hermitian block structure).  Peak scratch is one set of per-chunk
    strips — the (F, taps*D, T) planes are never materialized."""
    F, D, T = Y.shape
    pad = (-T) % chunk_size
    hist = delay + taps - 1
    Yrp = jnp.pad(jnp.real(Y), ((0, 0), (0, 0), (hist, pad)))
    Yip = jnp.pad(jnp.imag(Y), ((0, 0), (0, 0), (hist, pad)))
    wp = jnp.pad(inv_power, ((0, 0), (0, pad)))
    if frame_mask is not None:
        fmp = jnp.pad(frame_mask, (0, pad))
    num_chunks = (T + pad) // chunk_size
    groups = _tap_groups(taps, D)
    n = len(groups)
    rows = [len(g) * D for g in groups]

    def chunk_strips(Xp, c):
        """Per-tap-group stacked delayed blocks for chunk c."""
        start = c * chunk_size
        strips = []
        for g in groups:
            parts = []
            for tau in g:
                shift = delay + tau
                parts.append(jax.lax.dynamic_slice_in_dim(
                    Xp, start + hist - shift, chunk_size, axis=2))
            s = jnp.concatenate(parts, axis=1)
            if frame_mask is not None:
                m = jax.lax.dynamic_slice_in_dim(fmp, start, chunk_size, 0)
                s = s * m[None, None, :].astype(s.dtype)
            strips.append(s)
        return strips

    def dot(a, b):
        return jnp.einsum('fit,fjt->fij', a, b, precision=precision)

    def scan_body(carry, c):
        lower, A, Pr, Pi = carry
        U = chunk_strips(Yrp, c)
        V = chunk_strips(Yip, c)
        w = jax.lax.dynamic_slice_in_dim(wp, c * chunk_size, chunk_size, 1)
        Uw = [u * w[:, None, :].astype(u.dtype) for u in U]
        Vw = [v * w[:, None, :].astype(v.dtype) for v in V]
        yr = jax.lax.dynamic_slice_in_dim(Yrp, c * chunk_size + hist,
                                          chunk_size, axis=2)
        yi = jax.lax.dynamic_slice_in_dim(Yip, c * chunk_size + hist,
                                          chunk_size, axis=2)
        lower = [[lower[i][j] + dot(Uw[i], U[j]) + dot(Vw[i], V[j])
                  for j in range(i + 1)] for i in range(n)]
        A = [[A[i][j] + dot(Vw[i], U[j]) for j in range(n)]
             for i in range(n)]
        Pr = [Pr[i] + dot(Uw[i], yr) + dot(Vw[i], yi) for i in range(n)]
        Pi = [Pi[i] + dot(Vw[i], yr) - dot(Uw[i], yi) for i in range(n)]
        return (lower, A, Pr, Pi), None

    rdtype = Yrp.dtype
    init = (
        [[jnp.zeros((F, rows[i], rows[j]), rdtype) for j in range(i + 1)]
         for i in range(n)],
        [[jnp.zeros((F, rows[i], rows[j]), rdtype) for j in range(n)]
         for i in range(n)],
        [jnp.zeros((F, rows[i], D), rdtype) for i in range(n)],
        [jnp.zeros((F, rows[i], D), rdtype) for i in range(n)],
    )
    (lower, A, Pr, Pi), _ = jax.lax.scan(
        scan_body, init, jnp.arange(num_chunks))

    Rr = _assemble_blocks(
        [[lower[i][j] if i >= j else jnp.swapaxes(lower[j][i], -1, -2)
          for j in range(n)] for i in range(n)])
    Af = _assemble_blocks(A)
    Ri = Af - jnp.swapaxes(Af, -1, -2)
    R = jax.lax.complex(Rr, Ri)
    P = jax.lax.complex(jnp.concatenate(Pr, axis=1),
                        jnp.concatenate(Pi, axis=1))
    G = _solve_G(R, P, regularization, inv_power.dtype,
                 refine=solve_refine)
    Gr, Gi = jnp.real(G), jnp.imag(G)
    Grs, Gis = [], []
    s = 0
    for r in rows:
        Grs.append(Gr[:, s:s + r, :])
        Gis.append(Gi[:, s:s + r, :])
        s += r

    def tail_body(_, c):
        U = chunk_strips(Yrp, c)
        V = chunk_strips(Yip, c)
        tr = ti = 0.0
        for gr, gi, u, v in zip(Grs, Gis, U, V):
            tr = tr + jnp.einsum('fid,fit->fdt', gr, u,
                                 precision=precision) \
                + jnp.einsum('fid,fit->fdt', gi, v, precision=precision)
            ti = ti + jnp.einsum('fid,fit->fdt', gr, v,
                                 precision=precision) \
                - jnp.einsum('fid,fit->fdt', gi, u, precision=precision)
        return None, jax.lax.complex(tr, ti)

    _, tails = jax.lax.scan(tail_body, None, jnp.arange(num_chunks))
    tail = jnp.moveaxis(tails, 0, 2).reshape(F, D, num_chunks * chunk_size)
    return Y - tail[..., :T]


@functools.partial(
    jax.jit,
    static_argnames=('taps', 'delay', 'iterations', 'psd_context',
                     'regularization', 'chunk_size', 'has_frame_mask',
                     'stats_backend', 'precision', 'solve_refine'))
def _wpe_impl(Y, taps, delay, iterations, psd_context, regularization,
              chunk_size, frame_mask, has_frame_mask,
              stats_backend='auto', precision='highest', solve_refine=0):
    fm = frame_mask if has_frame_mask else None
    prec = _PRECISIONS[precision]
    if stats_backend == 'auto':
        # measured on v5e, stft+wpe(3) at the headline shape
        # (scripts_dev/bench_wpe_stats_form.py): the real-form
        # Hermitian-blocked statistics win on both scene types
        # (stationary 261 -> 239 ms, envelope-modulated bench scene
        # 256 -> 243 ms, finite, deviation at solver-roundoff level).
        stats_backend = 'real'
    if chunk_size is None and stats_backend == 'real':
        # real-form backend: tap-group strips of the real/imag planes,
        # built once (loop-invariant); the complex (F, taps*D, T) stack
        # is never materialized.
        D = Y.shape[-2]
        Yr, Yi = jnp.real(Y), jnp.imag(Y)
        groups = _tap_groups(taps, D)
        U = [_build_strip(Yr, g, delay) for g in groups]
        V = [_build_strip(Yi, g, delay) for g in groups]
        if fm is not None:
            m = fm[None, None, :]
            U = [u * m.astype(u.dtype) for u in U]
            V = [v * m.astype(v.dtype) for v in V]

        def body(_, X):
            inv_power = get_power_inverse(X, psd_context, fm)
            return _wpe_iteration_real(Y, U, V, Yr, Yi, inv_power,
                                       regularization, precision=prec,
                                       solve_refine=solve_refine)
    elif chunk_size is None:
        Y_tilde = build_y_tilde(Y, taps, delay)
        if fm is not None:
            Y_tilde = Y_tilde * fm[None, None, :].astype(Y_tilde.dtype)

        def body(_, X):
            inv_power = get_power_inverse(X, psd_context, fm)
            return _wpe_iteration(Y, Y_tilde, inv_power, regularization,
                                  stats_backend=stats_backend,
                                  precision=prec,
                                  solve_refine=solve_refine)
    elif stats_backend == 'real':
        def body(_, X):
            inv_power = get_power_inverse(X, psd_context, fm)
            return _chunked_wpe_iteration_real(
                Y, inv_power, taps, delay, regularization, chunk_size, fm,
                precision=prec, solve_refine=solve_refine)
    else:
        def body(_, X):
            inv_power = get_power_inverse(X, psd_context, fm)
            return _chunked_wpe_iteration(
                Y, inv_power, taps, delay, regularization, chunk_size, fm,
                precision=prec, solve_refine=solve_refine)

    X = jax.lax.fori_loop(0, iterations, body, Y)
    if fm is not None:
        X = X * fm[None, None, :].astype(X.dtype)
    return X


def wpe(Y, *, taps: int = 10, delay: int = 2, iterations: int = 3,
        psd_context: int = 0, regularization: float = 1e-4,
        chunk_size: int = None, frame_mask=None,
        stats_backend: str = 'auto', precision: str = 'highest',
        solve_refine: int = 0):
    """Batched offline WPE.

    Args:
      Y: (F, D, T) complex spectrogram (nara_wpe's frequency-major layout;
         the reference transposes into this layout at core.py:52-58).
      taps / delay / iterations / psd_context: reference defaults 10/2/3/0
         (core.py:580-583).
      frame_mask: optional (T,) validity mask for padded batches.

      chunk_size: when set, accumulate the correlation statistics over
         T-chunks of this many frames with ``lax.scan`` instead of
         materializing the (F, taps*D, T) stacked signal (~2.6 GB for the
         24-channel production config) — required for batched or
         very-long-utterance processing.

      stats_backend: correlation-statistics formulation.  'auto'
         (default) resolves to 'real' — real-arithmetic Grams with the
         Hermitian block structure exploited, the measured fastest (see
         the module docstring).  'xla' = complex einsums; 'pallas' =
         fused single-pass statistics kernel (measured dead end, kept
         as an option).

      solve_refine: iterative-refinement steps on the regularized filter
         solve (residual against the UNLOADED correlation matrix) —
         cancels the first-order bias of the diagonal load at ~one extra
         (taps*D, taps*D) matmul + panel solve per step.  See
         ``linalg.hermitian_solve(refine=...)``.

      precision: MXU precision of the statistics/tail contractions
         ('highest' | 'high' | 'default').  Keep the default 'highest':
         'high' NaNs on realistic scenes with near-silent stretches and
         buys nothing where it is finite (HBM-bound tail) — see the
         module-level dead-end note.  The solve internals always run at
         HIGHEST.

    Returns:
      Dereverberated (F, D, T).
    """
    Y = jnp.asarray(Y)
    return _wpe_impl(Y, taps, delay, iterations, psd_context,
                     regularization, chunk_size,
                     frame_mask if frame_mask is None
                     else jnp.asarray(frame_mask, dtype=bool),
                     frame_mask is not None, stats_backend=stats_backend,
                     precision=precision, solve_refine=solve_refine)
