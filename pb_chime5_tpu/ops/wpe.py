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


def _wpe_iteration(Y, Y_tilde, inv_power, regularization,
                   stats_backend='auto', precision=_HIGHEST):
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
    backend = stats_backend
    if backend == 'auto':
        # measured on v5e (24ch headline), twice: the fused Pallas
        # statistics kernel loses to XLA even after the round-3
        # standard-form rewrite removed its hidden in-VMEM transpose
        # (333 vs 250 ms stft+wpe(3); the original dim-0/dim-0 form
        # measured 293 vs 273).  The R einsum is already AT the 6-pass
        # MXU FLOP bound in XLA, so the fusion can only recover the
        # weighted-copy HBM traffic (~3 ms/iter) and instead pays
        # per-iteration time-major plane builds.  Kept as an option
        # (and a tested example of the revisited-accumulation pattern).
        backend = 'xla'
    if backend == 'pallas':
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
    G = _solve_G(R, P, regularization, inv_power.dtype)
    tail = jnp.einsum('fid,fit->fdt', G.conj(), Y_tilde,
                      precision=precision)
    return Y - tail


def _solve_G(R, P, regularization, rdtype):
    """R G = P, equilibrated + diagonally loaded (see _wpe_iteration).

    The regularized path uses ``hermitian_solve`` (unpivoted Gauss-Jordan
    for small taps*D, blocked Cholesky on the MXU for large) —
    matmul/elementwise only, identical equilibration + loading to the
    previous formulation, but with no linalg custom calls (which the axon
    TPU backend cannot compile at all).
    """
    if regularization:
        return hermitian_solve(R, P, relative_load=regularization)
    return stable_solve(R, P)


def _chunked_wpe_iteration(Y, inv_power, taps, delay, regularization,
                           chunk_size, frame_mask, precision=_HIGHEST):
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
    G = _solve_G(R, P, regularization, inv_power.dtype)

    def tail_body(X, c):
        yt = chunk_tilde(c)
        tail = jnp.einsum('fid,fit->fdt', G.conj(), yt,
                          precision=precision)
        return X, tail

    _, tails = jax.lax.scan(tail_body, None, jnp.arange(num_chunks))
    # tails (num_chunks, F, D, chunk) -> (F, D, T)
    tail = jnp.moveaxis(tails, 0, 2).reshape(F, D, num_chunks * chunk_size)
    return Y - tail[..., :T]


@functools.partial(
    jax.jit,
    static_argnames=('taps', 'delay', 'iterations', 'psd_context',
                     'regularization', 'chunk_size', 'has_frame_mask',
                     'stats_backend', 'precision'))
def _wpe_impl(Y, taps, delay, iterations, psd_context, regularization,
              chunk_size, frame_mask, has_frame_mask,
              stats_backend='auto', precision='highest'):
    fm = frame_mask if has_frame_mask else None
    prec = _PRECISIONS[precision]
    if chunk_size is None:
        Y_tilde = build_y_tilde(Y, taps, delay)
        if fm is not None:
            Y_tilde = Y_tilde * fm[None, None, :].astype(Y_tilde.dtype)

        def body(_, X):
            inv_power = get_power_inverse(X, psd_context, fm)
            return _wpe_iteration(Y, Y_tilde, inv_power, regularization,
                                  stats_backend=stats_backend,
                                  precision=prec)
    else:
        def body(_, X):
            inv_power = get_power_inverse(X, psd_context, fm)
            return _chunked_wpe_iteration(
                Y, inv_power, taps, delay, regularization, chunk_size, fm,
                precision=prec)

    X = jax.lax.fori_loop(0, iterations, body, Y)
    if fm is not None:
        X = X * fm[None, None, :].astype(X.dtype)
    return X


def wpe(Y, *, taps: int = 10, delay: int = 2, iterations: int = 3,
        psd_context: int = 0, regularization: float = 1e-4,
        chunk_size: int = None, frame_mask=None,
        stats_backend: str = 'auto', precision: str = 'highest'):
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
                     precision=precision)
