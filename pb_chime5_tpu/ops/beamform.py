"""Mask-based beamformers (batched over frequency, jittable).

Rebuilds the pb_bss.extraction.beamformer capabilities used by the
reference wrapper (pb_chime5/speech_enhancement/beamforming_wrapper.py):

* masked power-spectral-density matrices,
* MVDR in the Souden formulation with SNR-optimal global reference-channel
  selection,
* blind analytic normalization (BAN) postgain,
* GEV (max-SNR) beamformer — the reference calls a Cython/LAPACK
  generalized-eig loop (`force_cython=True`, wrapper:79); here the dominant
  generalized eigenvector of (Phi_X, Phi_N) is the dominant eigenvector of
  Phi_N^{-1} Phi_X, computed batched over all frequencies by repeated
  squaring — matmuls only, no eig custom call (which the axon TPU backend
  cannot compile),
* LCMV with a target and an interference constraint,
* mask condensation over channels by median
  (`morph('DTF->FT', reduce=np.median)`, wrapper:27-34).

Shapes follow the wrapper's internal convention: Y (F, D, T), masks (F, T),
beamforming vectors (F, D), output (F, T).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# float32 MXU precision for every PSD/quadratic-form contraction (TPU's
# default bf16 matmul precision is not sufficient for D x D covariance
# conditioning).
_HIGHEST = jax.lax.Precision.HIGHEST

from pb_chime5_tpu.ops.linalg import (
    hermitize, eye_like, hermitian_solve, dominant_eigenvector)

__all__ = [
    'condense_mask',
    'psd_matrix',
    'mvdr_souden_vector',
    'gev_vector',
    'lcmv_vector',
    'blind_analytic_normalization',
    'apply_beamforming_vector',
    'beamform_mvdr_souden_from_masks',
    'beamform_gev_from_masks',
    'beamform_lcmv_from_masks',
    'beamform_mvdr_souden_with_lorenz_mask',
    'beamform_mvdr_souden_with_quantile_mask',
]


def condense_mask(mask):
    """Mask (..., D, T, F) or (T, F) -> (F, T).

    Channel axes are reduced by median, matching the reference's
    ``morph('DTF->FT', mask, reduce=np.median)`` (wrapper:27-34).
    """
    mask = jnp.asarray(mask)
    if mask.ndim == 2:                    # (T, F)
        return mask.T
    if mask.ndim == 3:                    # (D, T, F)
        return jnp.median(mask, axis=0).T
    if mask.ndim == 4:                    # (1, D, T, F)
        return jnp.median(mask[0], axis=0).T
    raise NotImplementedError(mask.shape)


def _to_fdt(Y):
    """Y (D, T, F) or (1, D, T, F) -> (F, D, T) (wrapper:21-24)."""
    Y = jnp.asarray(Y)
    if Y.ndim == 4:
        Y = Y[0]
    return jnp.transpose(Y, (2, 0, 1))


def psd_matrix(Y, mask=None):
    """Masked PSD:  Phi_f = sum_t m_ft y_ft y_ft^H / sum_t m_ft.

    Y (F, D, T), mask (F, T) real -> (F, D, D).
    """
    Y = jnp.asarray(Y)
    if mask is None:
        mask = jnp.ones(Y.shape[:1] + Y.shape[2:], dtype=Y.real.dtype)
    mask = jnp.asarray(mask, dtype=Y.real.dtype)
    weighted = Y * mask[:, None, :].astype(Y.dtype)
    psd = jnp.einsum('fdt,fet->fde', weighted, Y.conj(),
                     precision=_HIGHEST)
    norm = jnp.maximum(jnp.sum(mask, axis=-1), jnp.finfo(mask.dtype).tiny)
    return psd / norm[:, None, None].astype(Y.dtype)


def _snr_optimal_reference_channel(w_mat, cov_x, cov_n, eps,
                                   snr_reduce=None):
    """Reference channel maximizing the frequency-summed output SNR.

    w_mat (F, D, R): candidate beamformers (one per reference channel R).
    Returns a scalar int channel index (pb_bss
    ``get_optimal_reference_channel`` semantics: numerator and denominator
    each summed over frequency *and* channels before the ratio).

    ``snr_reduce`` optionally sums the (R,) statistics across a sharded
    frequency axis (``psum`` under ``shard_map``) so every shard selects
    the same channel.
    """
    num = jnp.einsum('fdr,fde,fer->r', w_mat.conj(), cov_x, w_mat,
                     precision=_HIGHEST).real
    den = jnp.einsum('fdr,fde,fer->r', w_mat.conj(), cov_n, w_mat,
                     precision=_HIGHEST).real
    if snr_reduce is not None:
        num = snr_reduce(num)
        den = snr_reduce(den)
    snr = num / jnp.maximum(den, eps)
    return jnp.argmax(snr)


def mvdr_souden_vector(cov_x, cov_n, *, eps=1e-10, ref_channel=None,
                       return_ref_channel=False, snr_reduce=None):
    """MVDR (Souden):  w = (Phi_N^{-1} Phi_X / tr(Phi_N^{-1} Phi_X)) e_ref.

    cov_x, cov_n (F, D, D) -> w (F, D).  When ``ref_channel`` is None the
    SNR-optimal global reference channel is selected (one index shared by
    all frequencies, like pb_bss).
    """
    # Equilibrated Gauss-Jordan solve with an eps-relative diagonal load —
    # matmul-only (no LU/SVD custom calls) and parity-preserving: the load
    # is 64*eps(dtype), i.e. ~1e-14 relative in the float64 oracle tests.
    phi = hermitian_solve(cov_n, cov_x)
    lam = jnp.trace(phi, axis1=-2, axis2=-1).real[..., None, None]
    mat = phi / jnp.maximum(lam, eps).astype(phi.dtype)
    D = mat.shape[-1]
    if ref_channel is None:
        ref_channel = _snr_optimal_reference_channel(
            mat, cov_x, cov_n, eps, snr_reduce=snr_reduce)
    elif isinstance(ref_channel, (int, np.integer)):
        # numpy-take semantics for a user-supplied static index: resolve
        # negatives, reject out-of-range (the one-hot reduction below
        # would otherwise silently return an all-zero beamformer)
        if not -D <= ref_channel < D:
            raise ValueError(
                f'ref_channel {ref_channel} out of range for D={D}')
        ref_channel = ref_channel % D
    else:
        # traced index: clamp into [-D, D-1] then wrap negatives
        ref_channel = jnp.clip(ref_channel, -D, D - 1) % D
    # one-hot mask-and-reduce, NOT jnp.take: the argmax-selected channel
    # is a traced index, and a traced-index gather costs ~10-70 ms on
    # the axon runtime (docs/ARCHITECTURE.md "axon-runtime rules"); the
    # masked sum is exact (single nonzero term) and also handles a
    # static user-specified ref_channel (constant-folded one-hot)
    onehot = (jnp.arange(mat.shape[-1]) == ref_channel).astype(mat.dtype)
    w = jnp.sum(mat * onehot, axis=-1)
    if return_ref_channel:
        return w, ref_channel
    return w


def gev_vector(cov_x, cov_n, *, eps_scale=1e-10):
    """GEV / max-SNR beamformer: dominant generalized eigenvector of
    (Phi_X, Phi_N), i.e. the dominant eigenvector of Phi_N^{-1} Phi_X
    (real non-negative spectrum), found by repeated squaring — batched
    matmuls only, no eig/cholesky custom calls.

    Normalization matches a generalized-eig solver's B-orthonormal
    convention: w^H Phi_N w = 1; the per-frequency arbitrary phase is
    fixed by rotating the first channel's coefficient real-positive.
    """
    phi = hermitian_solve(hermitize(cov_n), cov_x,
                          relative_load=eps_scale)        # Phi_N^{-1} Phi_X
    w = dominant_eigenvector(phi)
    nquad = jnp.einsum('fd,fde,fe->f', w.conj(), cov_n, w,
                       precision=_HIGHEST).real
    scale = 1.0 / jnp.sqrt(jnp.maximum(nquad, jnp.finfo(nquad.dtype).tiny))
    return w * scale[..., None].astype(w.dtype)


def lcmv_vector(cov_x, cov_i, cov_n, *, eps=1e-10):
    """LCMV with unit response toward the target subspace and a null toward
    the interference subspace:

        w = Phi_N^{-1} C (C^H Phi_N^{-1} C)^{-1} g,   g = [1, 0]

    where the columns of C are the dominant eigenvectors of Phi_X and
    Phi_I.  Same capability as pb_bss ``get_lcmv_vector_souden`` as used by
    the reference wrapper (wrapper:127-171); the constraint directions are
    estimated from the mask PSDs.
    """
    a_x = dominant_eigenvector(hermitize(cov_x))
    a_i = dominant_eigenvector(hermitize(cov_i))
    C = jnp.stack([a_x, a_i], axis=-1)                    # (F, D, 2)
    ninv_c = hermitian_solve(hermitize(cov_n), C,
                             relative_load=eps)           # (F, D, 2)
    gram = jnp.matmul(C.conj().swapaxes(-2, -1), ninv_c,
                      precision=_HIGHEST)                 # (F, 2, 2)
    g = jnp.zeros((*gram.shape[:-2], 2, 1), dtype=gram.dtype)
    g = g.at[..., 0, 0].set(1.0)
    coef = hermitian_solve(hermitize(gram), g)            # (F, 2, 1)
    return jnp.matmul(ninv_c, coef, precision=_HIGHEST)[..., 0]


def blind_analytic_normalization(w, cov_n):
    """BAN postgain:  w *= sqrt(w^H Phi_N^2 w / D) / (w^H Phi_N w).

    Matches pb_bss ``blind_analytic_normalization`` (see SURVEY.md 2.9).
    """
    d = w.shape[-1]
    nw = jnp.einsum('fde,fe->fd', cov_n, w, precision=_HIGHEST)
    numerator = jnp.sqrt(jnp.abs(
        jnp.einsum('fd,fd->f', w.conj(),
                   jnp.einsum('fde,fe->fd', cov_n, nw,
                              precision=_HIGHEST), precision=_HIGHEST)
        / d))
    denominator = jnp.abs(jnp.einsum('fd,fd->f', w.conj(), nw,
                                     precision=_HIGHEST))
    gain = numerator / jnp.maximum(denominator,
                                   jnp.finfo(numerator.dtype).tiny)
    return w * gain[..., None].astype(w.dtype)


def apply_beamforming_vector(w, Y):
    """x_hat_ft = sum_d w*_fd y_fdt.   w (F, D), Y (F, D, T) -> (F, T)."""
    return jnp.einsum('fd,fdt->ft', w.conj(), Y,
                      precision=_HIGHEST)


# ---------------------------------------------------------------------------
# from-masks entry points (wrapper-level API, reference wrapper:108-208)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('ban',))
def beamform_mvdr_souden_from_masks(Y, X_mask, N_mask, *, ban=True):
    """Y (D, T, F) (or (1, D, T, F)), masks broadcastable per
    ``condense_mask`` -> enhanced spectrogram (T, F)."""
    Yf = _to_fdt(Y)
    x_mask = condense_mask(X_mask)
    n_mask = condense_mask(N_mask)
    cov_x = psd_matrix(Yf, x_mask)
    cov_n = psd_matrix(Yf, n_mask)
    w = mvdr_souden_vector(cov_x, cov_n, eps=1e-10)
    if ban:
        w = blind_analytic_normalization(w, cov_n)
    return apply_beamforming_vector(w, Yf).T


@functools.partial(jax.jit, static_argnames=('ban',))
def beamform_gev_from_masks(Y, X_mask, N_mask, *, ban=True):
    Yf = _to_fdt(Y)
    x_mask = condense_mask(X_mask)
    n_mask = condense_mask(N_mask)
    cov_x = psd_matrix(Yf, x_mask)
    cov_n = psd_matrix(Yf, n_mask)
    w = gev_vector(cov_x, cov_n)
    if ban:
        w = blind_analytic_normalization(w, cov_n)
    return apply_beamforming_vector(w, Yf).T


@functools.partial(jax.jit, static_argnames=('ban',))
def beamform_lcmv_from_masks(Y, X_mask, I_mask, N_mask, *, ban=False):
    Yf = _to_fdt(Y)
    cov_x = psd_matrix(Yf, condense_mask(X_mask))
    cov_i = psd_matrix(Yf, condense_mask(I_mask))
    cov_n = psd_matrix(Yf, condense_mask(N_mask))
    w = lcmv_vector(cov_x, cov_i, cov_n)
    if ban:
        w = blind_analytic_normalization(w, cov_i + cov_n)
    return apply_beamforming_vector(w, Yf).T


def beamform_mvdr_souden_with_lorenz_mask(Y, X_hat=None):
    """Unsupervised MVDR: speech mask from the Lorenz-curve energy mask
    (reference wrapper:211-227)."""
    from pb_chime5_tpu.ops.masks import lorenz_mask
    if X_hat is None:
        X_hat = Y
    X_mask = jnp.swapaxes(
        lorenz_mask(jnp.swapaxes(jnp.asarray(X_hat), -2, -1)), -2, -1)
    N_mask = 1.0 - X_mask
    return beamform_mvdr_souden_from_masks(Y, X_mask, N_mask, ban=False)


def beamform_mvdr_souden_with_quantile_mask(Y, X_hat=None,
                                            quantile=(0.1, -0.8)):
    """Unsupervised MVDR: speech/noise masks from energy quantiles
    (reference wrapper:230-251; default [0.1, -0.8] = loudest 10% vs
    quietest 80% of frames)."""
    from pb_chime5_tpu.ops.masks import quantile_mask
    if X_hat is None:
        X_hat = Y
    X_mask, N_mask = quantile_mask(
        jnp.asarray(X_hat), list(quantile), sensor_axis=None, axis=-2)
    return beamform_mvdr_souden_from_masks(Y, X_mask, N_mask, ban=False)
