"""The fused GSS enhancement program — one XLA computation per utterance.

This is the TPU-native equivalent of the reference's per-utterance numeric
hot path ``Enhancer.enhance_observation`` (pb_chime5/core.py:514-571):

    STFT -> WPE -> cacGMM EM ("GSS") -> mask context drop ->
    MVDR-Souden(+BAN) / GEV -> optional mask postfilter -> iSTFT

Everything between the raw waveform and the enhanced waveform is traced
once and compiled by XLA; the 513-frequency EM loop is a ``vmap``; dynamic
per-example quantities (target speaker index, context frame counts, valid
sample count) are traced scalars so one compiled program serves a whole
length bucket.

Layout notes (chosen for the TPU, not mirroring the reference):
  waveform (D, N) -> spectrogram is kept frequency-major (F, D, T) through
  WPE and the beamformer, and (F, T, D) through the EM, so every
  T-contraction is a plain batched matmul over the leading F axis.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pb_chime5_tpu.ops.stft import (
    stft, istft, stft_frame_count, valid_frame_mask)
from pb_chime5_tpu.ops.wpe import wpe
from pb_chime5_tpu.ops.cacgmm import (
    cacgmm_posteriors, cacgmm_posteriors_debug, CacgmmConfig)
from pb_chime5_tpu.ops import beamform as bf

__all__ = ['GssConfig', 'gss_enhance', 'gss_enhance_debug',
           'gss_enhance_split', 'GssPipeline']


@dataclasses.dataclass(frozen=True)
class GssConfig:
    """Static pipeline configuration (hashable; one compile per value).

    Field defaults mirror the reference factory ``get_enhancer``
    (pb_chime5/core.py:574-601).
    """
    stft_size: int = 1024
    stft_shift: int = 256
    stft_fading: bool = True

    wpe: bool = True
    wpe_taps: int = 10
    wpe_delay: int = 2
    wpe_iterations: int = 3
    wpe_psd_context: int = 0
    # equilibrated-Cholesky diagonal loading (see ops/wpe.py); 0 restores
    # the reference-exact float64 LU solve
    wpe_regularization: float = 1e-4
    # chunked WPE statistics (see ops/wpe.py): None materializes the
    # (F, taps*D, T) stacked signal; an int bounds HBM for batched /
    # very long inputs
    wpe_chunk_size: int = None
    # MXU precision of the WPE statistics/tail contractions.  Keep
    # 'highest': 'high' (3-pass bf16) NaNs on scenes with near-silent
    # stretches and measures no faster where finite — see the measured
    # dead-end note at the top of ops/wpe.py.
    wpe_precision: str = 'highest'
    # correlation-statistics formulation (see ops/wpe.py):
    # 'auto' resolves to the fastest measured backend for the platform,
    # 'real' = real-arithmetic Hermitian-blocked Grams, 'xla' = complex
    # einsums, 'pallas' = fused statistics kernel (a measured dead end,
    # kept as an option).
    wpe_stats_backend: str = 'auto'
    # iterative-refinement steps on the regularized WPE filter solve
    # (residual against the UNLOADED correlation matrix).  Default 0:
    # measured at the production stress shape (PARITY.md, ledger
    # "Round 4: WPE solve iterative refinement"), refinement contracts
    # the load bias only by sigma/(sigma+lambda) per mode — 9.63% ->
    # 9.52% (1 step) -> 9.47% (2) vs the unregularized f64 oracle,
    # because the deviation lives in near-null modes (sigma << 1e-4)
    # that also NaN f32 at smaller loads even WITH refinement.  At
    # well-conditioned (short/small) shapes 1 step is a 13x parity win
    # (tests/test_wpe.py::test_solve_refine_cancels_regularization_bias);
    # the knob is kept for such uses.
    wpe_solve_refine: int = 0

    bss_iterations: int = 20
    bss_iterations_post: int = 1
    # EM execution backend: 'auto' = fused Pallas kernel on TPU, XLA
    # einsums elsewhere (see CacgmmConfig.em_backend)
    bss_em_backend: str = 'auto'
    # 'gauss_jordan' (matmul-only, the TPU-safe default) |
    # 'cholesky' | 'schur' | 'eigh'
    bss_inverse: str = 'gauss_jordan'

    bf: str = 'mvdrSouden_ban'  # 'mvdrSouden_ban' | 'mvdr_souden' | 'gev_ban'
    #                             | 'gev' | 'lcmv' | 'ch2' | 'sum'
    postfilter: str = None                 # None | 'mask_mul'

    # 'fused': the whole chain is ONE XLA program (fastest steady-state
    # dispatch).  'fast_start': three programs split at the stage
    # boundaries (stft+wpe | EM | beamform+istft) whose compilations are
    # smaller AND can be warmed concurrently (GssPipeline.warmup) —
    # for fresh machines where the fused program's cold compile
    # dominates first-utterance latency.  Intermediates stay on-device
    # (complex never crosses to the host).
    compile_mode: str = 'fused'

    @property
    def cacgmm_config(self):
        return CacgmmConfig(
            iterations=self.bss_iterations,
            iterations_post=self.bss_iterations_post,
            inverse=self.bss_inverse,
            em_backend=self.bss_em_backend,
        )


def _beamform(Obs_fdt, target_mask_kt, distortion_mask_kt, config,
              snr_reduce=None, noise_mask_kt=None):
    """Obs (F, D, T), masks (T, F)-style handled by caller as (F, T).

    ``snr_reduce`` optionally reduces the reference-channel SNR statistics
    across a sharded frequency axis (a ``psum`` under ``shard_map``) so
    every shard picks the same global reference channel.
    """
    kind = config.bf
    if kind in ('ch2', 'sum'):
        X = Obs_fdt[:, 2, :] if kind == 'ch2' else jnp.sum(Obs_fdt, axis=1)
        return X
    cov_x = bf.psd_matrix(Obs_fdt, target_mask_kt)
    cov_n = bf.psd_matrix(Obs_fdt, distortion_mask_kt)
    if kind in ('mvdrSouden_ban', 'mvdr_souden'):
        w = bf.mvdr_souden_vector(cov_x, cov_n, eps=1e-10,
                                  snr_reduce=snr_reduce)
        if kind == 'mvdrSouden_ban':
            w = bf.blind_analytic_normalization(w, cov_n)
    elif kind in ('gev_ban', 'gev'):
        w = bf.gev_vector(cov_x, cov_n)
        if kind == 'gev_ban':
            w = bf.blind_analytic_normalization(w, cov_n)
    elif kind in ('lcmv', 'lcmv_ban'):
        # target constraint + interference null; the garbage class (last
        # mask) provides the noise PSD, the remaining speakers the
        # interference PSD
        assert noise_mask_kt is not None, kind
        cov_i = bf.psd_matrix(Obs_fdt, distortion_mask_kt - noise_mask_kt)
        cov_nn = bf.psd_matrix(Obs_fdt, noise_mask_kt)
        w = bf.lcmv_vector(cov_x, cov_i, cov_nn)
        if kind == 'lcmv_ban':
            w = bf.blind_analytic_normalization(w, cov_i + cov_nn)
    else:
        raise NotImplementedError(kind)
    return bf.apply_beamforming_vector(w, Obs_fdt)


def _wpe_stage(Obs_fdt, config: GssConfig, frame_mask):
    if not config.wpe:
        return Obs_fdt
    return wpe(
        Obs_fdt,
        taps=config.wpe_taps,
        delay=config.wpe_delay,
        iterations=config.wpe_iterations,
        psd_context=config.wpe_psd_context,
        regularization=config.wpe_regularization,
        chunk_size=config.wpe_chunk_size,
        frame_mask=frame_mask,
        stats_backend=config.wpe_stats_backend,
        precision=config.wpe_precision,
        solve_refine=config.wpe_solve_refine,
    )


def _em_stage(Obs_fdt, activity_freq, config: GssConfig, frame_mask):
    return cacgmm_posteriors(
        jnp.transpose(Obs_fdt, (0, 2, 1)),                 # (F, T, D)
        activity_freq,
        config=config.cacgmm_config,
        frame_mask=frame_mask,
    )                                                      # (F, K, T)


def _bf_stage(Obs_fdt, masks, target_index, config: GssConfig,
              start_context_frames, end_context_frames, frame_mask,
              snr_reduce=None):
    F, D, T = Obs_fdt.shape
    frame_idx = jnp.arange(T)
    keep = (frame_idx >= start_context_frames) & \
           (frame_idx < T - end_context_frames)
    if frame_mask is not None:
        keep = keep & frame_mask
    masks = masks * keep[None, None, :].astype(masks.dtype)

    # one-hot mask-and-reduce, NOT take_along_axis: a traced-index
    # gather costs ~10-70 ms on the axon runtime (see
    # docs/ARCHITECTURE.md "axon-runtime rules"); the masked sum is
    # exact (single nonzero term)
    K = masks.shape[1]
    onehot = (jnp.arange(K) == target_index).astype(masks.dtype)
    target_mask = jnp.sum(masks * onehot[None, :, None], axis=1)  # (F, T)
    distortion_mask = jnp.sum(masks, axis=1) - target_mask

    noise_mask = masks[:, -1, :] if config.bf.startswith('lcmv') else None
    X_hat = _beamform(Obs_fdt, target_mask, distortion_mask, config,
                      snr_reduce=snr_reduce,
                      noise_mask_kt=noise_mask)            # (F, T)

    if config.postfilter == 'mask_mul':
        X_hat = X_hat * target_mask.astype(X_hat.dtype)
    elif config.postfilter is not None:
        raise NotImplementedError(config.postfilter)
    return X_hat, masks


def enhance_spectrogram(
        Obs_fdt,
        activity_freq,
        target_index,
        *,
        config: GssConfig,
        start_context_frames=0,
        end_context_frames=0,
        frame_mask=None,
        snr_reduce=None,
):
    """The frequency-domain middle of the pipeline: WPE -> EM -> context
    drop -> beamformer.  Every step is per-frequency independent except
    the MVDR reference-channel statistic (see ``snr_reduce``), so this
    function can run on an arbitrary *shard* of the frequency axis.

    Obs_fdt (F, D, T) complex, activity_freq (K, T) ->
    (X_hat (F, T) complex, masks (F, K, T)).
    """
    Obs_fdt = _wpe_stage(Obs_fdt, config, frame_mask)
    masks = _em_stage(Obs_fdt, activity_freq, config, frame_mask)
    return _bf_stage(Obs_fdt, masks, target_index, config,
                     start_context_frames, end_context_frames, frame_mask,
                     snr_reduce=snr_reduce)


def _trim_output(x_hat, start, samples):
    """In-graph output trim: slice ``samples`` samples starting at the
    traced offset ``start`` out of the enhanced waveform, so only the
    emitted utterance region (not the ±context span) crosses the
    device->host boundary.  The tail is zero-padded by ``samples`` first
    so ``lax.dynamic_slice``'s start clamping (start <= len - size) can
    never shift the slice for any in-range ``start`` — the values are a
    pure copy, bit-identical to slicing on the host.

    The reference always materializes the full context span on the host
    and trims there (core.py:500-505); on this runtime the full-span
    download is ~4x the emitted bytes (10 s utterance + 2x15 s context).
    """
    if samples is None:
        return x_hat
    return jax.lax.dynamic_slice_in_dim(
        jnp.pad(x_hat, (0, samples)), start, samples)


@functools.partial(
    jax.jit,
    static_argnames=('config', 'num_output_samples',
                     'output_trim_samples'))
def gss_enhance(
        obs,
        activity_freq,
        target_index,
        *,
        config: GssConfig = GssConfig(),
        start_context_frames=0,
        end_context_frames=0,
        num_valid_samples=None,
        num_output_samples: int = None,
        output_trim_start=0,
        output_trim_samples: int = None,
):
    """Enhance one (possibly padded) multichannel utterance.

    Args:
      obs: (D, N) float waveform.  D stacks all arrays/channels
        (the reference's ``morph('ACN->A*CN')``, core.py:439).
      activity_freq: (K, T) per-class frame activity (bool/int), already
        projected to STFT frames (see
        ``pb_chime5_tpu.utils.activity_freq.activity_time_to_frequency``).
        T must equal the STFT frame count for N samples.
      target_index: traced int — index of the target speaker among the K
        classes.
      config: static pipeline configuration.
      start_context_frames / end_context_frames: traced ints — frames to
        zero at the start/end of the masks before beamforming
        (``bf_drop_context``, reference core.py:537-547).
      num_valid_samples: optional traced int — true sample count when
        ``obs`` is zero-padded to a bucket length.  Frames beyond the valid
        region are excluded from WPE/EM/beamformer statistics.
      num_output_samples: optional static int output length (defaults to N).
      output_trim_start / output_trim_samples: optional in-graph output
        trim (traced start, STATIC length) — when set, only
        ``x_hat[output_trim_start : output_trim_start +
        output_trim_samples]`` is returned (see :func:`_trim_output`), so
        the emitted utterance region rather than the full ±context span
        crosses the device->host boundary.

    Returns:
      (x_hat (num_output_samples,), masks (K, T, F)) — the enhanced
      waveform still contains the acoustic context; the caller trims
      ``start_context : start_context + num_samples_orig``
      (reference core.py:500-505) — unless ``output_trim_samples``
      already did it in-graph.
    """
    Obs, frame_mask, N = _stft_and_mask(obs, num_valid_samples, config)
    Obs = _wpe_stage(Obs, config, frame_mask)
    masks = _em_stage(Obs, activity_freq, config, frame_mask)
    X_hat, masks = _bf_stage(
        Obs, masks, target_index, config,
        start_context_frames, end_context_frames, frame_mask)
    x_hat = istft(
        X_hat.T, config.stft_size, config.stft_shift,
        fading=config.stft_fading,
        num_samples=num_output_samples if num_output_samples is not None
        else N,
    )
    x_hat = _trim_output(x_hat, output_trim_start, output_trim_samples)
    return x_hat, jnp.transpose(masks, (1, 2, 0))              # (K, T, F)


@functools.partial(
    jax.jit, static_argnames=('config', 'num_output_samples'))
def gss_enhance_debug(
        obs,
        activity_freq,
        target_index,
        *,
        config: GssConfig = GssConfig(),
        start_context_frames=0,
        end_context_frames=0,
        num_valid_samples=None,
        num_output_samples: int = None,
):
    """:func:`gss_enhance` with per-EM-iteration introspection (VERDICT
    r3 missing #3; the reference's ``stack_parameters`` debug collection,
    core.py:27-29, 211).

    Returns (x_hat, masks (K, T, F), debug dict) where the debug dict
    carries per-iteration mixture weights, covariance log-determinants, a
    condition-number proxy and posterior entropy — see
    ``ops.cacgmm.cacgmm_posteriors_debug``.  A SEPARATE compiled program:
    the production :func:`gss_enhance` is untouched; use this only to
    autopsy a bad utterance (docs/ARCHITECTURE.md "Debugging a bad
    utterance")."""
    Obs, frame_mask, N = _stft_and_mask(obs, num_valid_samples, config)
    Obs = _wpe_stage(Obs, config, frame_mask)
    masks, debug = cacgmm_posteriors_debug(
        jnp.transpose(Obs, (0, 2, 1)), activity_freq,
        config=config.cacgmm_config, frame_mask=frame_mask)
    X_hat, masks = _bf_stage(
        Obs, masks, target_index, config,
        start_context_frames, end_context_frames, frame_mask)
    x_hat = istft(
        X_hat.T, config.stft_size, config.stft_shift,
        fading=config.stft_fading,
        num_samples=num_output_samples if num_output_samples is not None
        else N,
    )
    return x_hat, jnp.transpose(masks, (1, 2, 0)), debug


def _slice_cached_obs(cache, offsets, num_arrays, slice_samples,
                      num_valid_samples):
    """Assemble the (A*C, N_pad) observation from the device-resident
    session window.  Contiguous dynamic slices with a traced start are
    ~free on this runtime (measured ~1 ms at (24, 640k) int16) — unlike
    traced-index GATHERS, the 10-70 ms pitfall (docs/ARCHITECTURE.md).
    Samples past ``num_valid_samples`` are zeroed so the result is
    bit-identical to the direct path's zero-padded upload."""
    A, N_pad = num_arrays, slice_samples
    C = cache.shape[0] // A
    obs = jnp.concatenate(
        [jax.lax.dynamic_slice(cache, (jnp.int32(a * C), offsets[a]),
                               (C, N_pad))
         for a in range(A)], axis=0)
    if num_valid_samples is not None:
        valid = jnp.arange(N_pad) < num_valid_samples
        obs = jnp.where(valid[None, :], obs, jnp.zeros((), obs.dtype))
    return obs


@functools.partial(
    jax.jit, static_argnames=('config', 'num_arrays', 'slice_samples',
                              'num_output_samples',
                              'output_trim_samples'))
def gss_enhance_cached(
        cache,
        offsets,
        activity_freq,
        target_index,
        *,
        config: GssConfig = GssConfig(),
        num_arrays: int,
        slice_samples: int,
        start_context_frames=0,
        end_context_frames=0,
        num_valid_samples=None,
        num_output_samples: int = None,
        output_trim_start=0,
        output_trim_samples: int = None,
):
    """:func:`gss_enhance` with the observation sliced out of a
    device-resident session-audio cache instead of uploaded per
    utterance.

    The reference re-reads (and the direct path re-uploads) every
    utterance's +-15 s acoustic context from the session recordings
    (core.py:439-488) — consecutive utterances overlap so heavily that
    per-utterance upload moves ~4x more bytes over PCIe/tunnel than the
    session contains.  Here the session loop keeps a rolling window of
    the session audio on-device (``models/audio_cache.py``) and each
    dispatch ships only A int32 offsets.

    Args:
      cache: (A*C, W) int16/float window of session audio, rows grouped
        per array (array-major, matching 'ACN->A*CN' stacking).
      offsets: (A,) int32 — per-array start of this utterance's window
        inside the cache (per-array clock drift means each array has its
        own offset).
      num_arrays / slice_samples: static A and window length N_pad.
      num_valid_samples: traced int N; samples >= N are zeroed in-graph,
        which makes the sliced observation BIT-IDENTICAL to the direct
        path's zero-padded upload (the cache holds real session audio
        past the utterance end where the direct path holds zeros).
      Everything else exactly as :func:`gss_enhance`.
    """
    obs = _slice_cached_obs(cache, offsets, num_arrays, slice_samples,
                            num_valid_samples)
    Obs, frame_mask, N = _stft_and_mask(obs, num_valid_samples, config)
    Obs = _wpe_stage(Obs, config, frame_mask)
    masks = _em_stage(Obs, activity_freq, config, frame_mask)
    X_hat, masks = _bf_stage(
        Obs, masks, target_index, config,
        start_context_frames, end_context_frames, frame_mask)
    x_hat = istft(
        X_hat.T, config.stft_size, config.stft_shift,
        fading=config.stft_fading,
        num_samples=num_output_samples if num_output_samples is not None
        else N,
    )
    x_hat = _trim_output(x_hat, output_trim_start, output_trim_samples)
    return x_hat, jnp.transpose(masks, (1, 2, 0))              # (K, T, F)


def _stft_and_mask(obs, num_valid_samples, config):
    obs = jnp.asarray(obs)
    if obs.dtype == jnp.int16:
        # raw PCM path: ship int16 over the host->device link (half the
        # bytes) and apply the 2^-15 scaling on device — bit-identical to
        # the reference's float64 read of PCM16 (audioread.py:40)
        obs = obs.astype(jnp.float32) * jnp.float32(2.0 ** -15)
    D, N = obs.shape
    size, shift = config.stft_size, config.stft_shift
    Obs = stft(obs, size, shift, fading=config.stft_fading)   # (D, T, F)
    T = Obs.shape[-2]
    Obs = jnp.transpose(Obs, (2, 0, 1))                        # (F, D, T)
    if num_valid_samples is not None:
        frame_mask = valid_frame_mask(
            num_valid_samples, T, size, shift, fading=config.stft_fading)
    else:
        frame_mask = None
    return Obs, frame_mask, N


# --------------------------------------------------------------------------
# fast_start mode: the same chain as THREE programs split at the stage
# boundaries.  Complex intermediates stay device-resident (the axon
# backend cannot move complex across the host boundary); semantics are
# identical to the fused program.
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('config',))
def _gss_front(obs, num_valid_samples, *, config):
    Obs, frame_mask, _ = _stft_and_mask(obs, num_valid_samples, config)
    return _wpe_stage(Obs, config, frame_mask), frame_mask


@functools.partial(jax.jit, static_argnames=('config',))
def _gss_em(Obs_fdt, activity_freq, frame_mask, *, config):
    return _em_stage(Obs_fdt, activity_freq, config, frame_mask)


@functools.partial(
    jax.jit,
    static_argnames=('config', 'num_output_samples',
                     'output_trim_samples'))
def _gss_back(Obs_fdt, masks, target_index, start_context_frames,
              end_context_frames, frame_mask, *, config,
              num_output_samples, output_trim_start=0,
              output_trim_samples=None):
    X_hat, masks = _bf_stage(
        Obs_fdt, masks, target_index, config,
        start_context_frames, end_context_frames, frame_mask)
    x_hat = istft(
        X_hat.T, config.stft_size, config.stft_shift,
        fading=config.stft_fading, num_samples=num_output_samples)
    x_hat = _trim_output(x_hat, output_trim_start, output_trim_samples)
    return x_hat, jnp.transpose(masks, (1, 2, 0))


@functools.partial(
    jax.jit, static_argnames=('config', 'num_arrays', 'slice_samples'))
def _gss_front_cached(cache, offsets, num_valid_samples, *, config,
                      num_arrays, slice_samples):
    """fast_start front stage fed from the session-audio cache (see
    :func:`gss_enhance_cached`): slice + stft + WPE in one program, so
    the cached path keeps fast_start's small concurrent compiles."""
    obs = _slice_cached_obs(cache, offsets, num_arrays, slice_samples,
                            num_valid_samples)
    Obs, frame_mask, _ = _stft_and_mask(obs, num_valid_samples, config)
    return _wpe_stage(Obs, config, frame_mask), frame_mask


def gss_enhance_split(
        obs,
        activity_freq,
        target_index,
        *,
        config: GssConfig = GssConfig(),
        start_context_frames=0,
        end_context_frames=0,
        num_valid_samples=None,
        num_output_samples: int = None,
        output_trim_start=0,
        output_trim_samples: int = None,
):
    """Same contract as :func:`gss_enhance`, executed as three programs
    (see ``GssConfig.compile_mode='fast_start'``)."""
    if num_output_samples is None:
        num_output_samples = int(np.shape(obs)[-1])
    Obs, frame_mask = _gss_front(obs, num_valid_samples, config=config)
    masks = _gss_em(Obs, activity_freq, frame_mask, config=config)
    return _gss_back(Obs, masks, target_index, start_context_frames,
                     end_context_frames, frame_mask, config=config,
                     num_output_samples=num_output_samples,
                     output_trim_start=output_trim_start,
                     output_trim_samples=output_trim_samples)


def gss_enhance_cached_split(
        cache,
        offsets,
        activity_freq,
        target_index,
        *,
        config: GssConfig = GssConfig(),
        num_arrays: int,
        slice_samples: int,
        start_context_frames=0,
        end_context_frames=0,
        num_valid_samples=None,
        num_output_samples: int = None,
        output_trim_start=0,
        output_trim_samples: int = None,
):
    """:func:`gss_enhance_cached` executed as three programs (the cached
    twin of :func:`gss_enhance_split`)."""
    if num_output_samples is None:
        num_output_samples = slice_samples
    Obs, frame_mask = _gss_front_cached(
        cache, offsets, num_valid_samples, config=config,
        num_arrays=num_arrays, slice_samples=slice_samples)
    masks = _gss_em(Obs, activity_freq, frame_mask, config=config)
    return _gss_back(Obs, masks, target_index, start_context_frames,
                     end_context_frames, frame_mask, config=config,
                     num_output_samples=num_output_samples,
                     output_trim_start=output_trim_start,
                     output_trim_samples=output_trim_samples)


def machine_cache_scope() -> str:
    """Subdirectory name scoping the persistent compile cache to this
    machine's platform + CPU feature set.

    JAX's persistent cache key does NOT include the host CPU's feature
    flags, but XLA:CPU AOT results are compiled FOR a concrete machine
    (``cpu_aot_loader.cc`` warns "could lead to execution errors such as
    SIGILL" on a feature mismatch).  Sharing one cache dir across
    machines — exactly what a repo-relative ``.jax_cache`` checked out on
    different hosts does — therefore risks loading incompatible AOT code
    on the CPU backend (observed: MULTICHIP_r04 tail).  Scope the dir by
    a hash of (machine arch, /proc/cpuinfo flags) so every distinct host
    CPU gets its own namespace; TPU backends get their own scope too
    (cheap, and keeps CPU/TPU entries from sharing directory metadata).
    """
    import hashlib
    import platform as _platform
    flags = ''
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    flags = ' '.join(sorted(line.split(':', 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha1(
        f'{_platform.machine()}|{flags}'.encode()).hexdigest()[:12]
    return f'machine-{digest}'


def enable_persistent_compilation_cache():
    """Idempotent: the fused program takes minutes to compile through the
    remote TPU compile service; cache compilations on disk
    (PB_JAX_CACHE_DIR env var or <repo>/.jax_cache), scoped per machine
    (:func:`machine_cache_scope`) so CPU AOT entries never cross hosts.

    NOT enabled when JAX is pinned to the CPU backend (tests, the
    driver's ``dryrun_multichip``, ``JAX_PLATFORMS=cpu`` runs): XLA:CPU
    AOT entries embed compile-time tuning pseudo-features
    (``+prefer-no-scatter``/``+prefer-no-gather``) that can never appear
    in the host's CPU feature list, so EVERY reload — even on the very
    machine that wrote the entry — logs a ``cpu_aot_loader.cc`` "could
    lead to execution errors such as SIGILL" warning (observed:
    MULTICHIP_r04 tail).  CPU compiles of these programs take seconds,
    not minutes; persistence buys nothing there and costs a scary
    correctness warning, so the cache is TPU-only."""
    import os
    if getattr(enable_persistent_compilation_cache, '_done', False):
        return
    enable_persistent_compilation_cache._done = True
    platforms = (jax.config.jax_platforms
                 or os.environ.get('JAX_PLATFORMS') or '')
    if platforms.split(',')[0].strip().lower() == 'cpu':
        return
    try:
        from pathlib import Path
        base = os.environ.get(
            'PB_JAX_CACHE_DIR',
            str(Path(__file__).resolve().parents[2] / '.jax_cache'))
        cache_dir = str(Path(base) / machine_cache_scope())
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass


class GssPipeline:
    """Convenience host wrapper: NumPy in, NumPy out, one compile per
    (config, D, bucketed N, K)."""

    def __init__(self, config: GssConfig = GssConfig(), *,
                 length_buckets=None, dtype=np.float32,
                 device_trim=True):
        self.config = config
        self.length_buckets = length_buckets
        self.dtype = dtype
        # device_trim: when a ``trim`` is passed to dispatch, slice the
        # emitted utterance region out of the enhanced waveform IN-GRAPH
        # (static bucketed length, see :meth:`output_bucket`) so only
        # ~the utterance bytes cross the device->host boundary instead
        # of the full ±context span (~4x at the reference's 15 s
        # context).  Bit-identical outputs; costs at most 8 extra
        # back-program compiles per length bucket.
        self.device_trim = device_trim
        enable_persistent_compilation_cache()

    def bucket_length(self, n: int) -> int:
        if not self.length_buckets:
            return n
        for b in self.length_buckets:
            if n <= b:
                return b
        # longer than every bucket: round up to a multiple of the largest
        # bucket's granularity so outliers still share compilations
        top = self.length_buckets[-1]
        return -(-n // top) * top

    @staticmethod
    def output_bucket(num_emitted: int, bucket_samples: int):
        """Static download length for an in-graph output trim of
        ``num_emitted`` samples from a ``bucket_samples``-long program:
        ``num_emitted`` rounded up to 1/8ths of the bucket (at most 8
        compile variants per bucket, at most bucket/8 wasted download).
        None when the trim would not shrink the download (caller should
        trim on the host as usual)."""
        step = -(-bucket_samples // 8)
        out = -(-int(num_emitted) // step) * step
        return out if out < bucket_samples else None

    def frame_count(self, num_samples: int) -> int:
        return stft_frame_count(
            num_samples, self.config.stft_size, self.config.stft_shift,
            fading=self.config.stft_fading)

    def _normalize_obs(self, obs):
        """Bring the observation to the compute dtype.  int16 PCM stays
        int16 only when computing in float32 (the in-graph scaling path
        is float32); any other compute dtype scales on the host so the
        configured precision is honored."""
        obs = np.asarray(obs)
        if obs.dtype == np.int16:
            if np.dtype(self.dtype) != np.float32:
                obs = (obs.astype(self.dtype) * 2.0 ** -15).astype(
                    self.dtype)
        elif obs.dtype == np.int32:    # PCM32: scale on host
            obs = (obs * 2.0 ** -31).astype(self.dtype)
        else:
            obs = obs.astype(self.dtype)
        if obs.ndim == 1:
            obs = obs[None]
        return obs

    def _plan_trim(self, trim, N, N_pad):
        """(valid samples of the downloaded waveform, host slice, jit
        kwargs) for an optional ``trim=(start, num_emitted)``.

        With ``device_trim`` the emitted region is sliced in-graph
        (:func:`_trim_output`, static :meth:`output_bucket` length) and
        the host keeps only ``[:num_emitted]``; otherwise — or when the
        trim region is not fully inside the valid samples, or would not
        shrink the download — ``gather`` applies exactly the
        ``x_hat[:N][start:start+num]`` the callers used to do
        themselves.  Either way ``gather`` returns the emitted
        waveform."""
        if trim is None:
            return N, slice(None), {}
        t0, tn = int(trim[0]), int(trim[1])
        out_pad = (self.output_bucket(tn, N_pad)
                   if self.device_trim and 0 <= t0 and t0 + tn <= N
                   else None)
        if out_pad is None:
            return N, slice(t0, t0 + tn), {}
        return tn, slice(None), dict(
            output_trim_start=jnp.int32(t0),
            output_trim_samples=out_pad)

    def dispatch(self, obs, activity_freq, target_index, *,
                 start_context_frames=0, end_context_frames=0,
                 trim=None):
        """Asynchronous call: returns an opaque handle immediately (jax
        dispatch is async), so the caller can enqueue the next
        utterance's upload+compute while this one runs; resolve with
        ``gather``.

        ``trim=(start, num_emitted)``: have ``gather`` return only the
        emitted utterance region (reference core.py:500-505) — sliced
        in-graph when profitable (see :meth:`_plan_trim`) so the
        ±context span never crosses the device->host boundary."""
        obs = self._normalize_obs(obs)
        D, N = obs.shape
        N_pad = self.bucket_length(N)
        T_pad = self.frame_count(N_pad)
        padded = np.zeros((D, N_pad), obs.dtype)
        padded[:, :N] = obs
        act = np.zeros((activity_freq.shape[0], T_pad), np.int8)
        act[:, :activity_freq.shape[1]] = np.asarray(activity_freq,
                                                     np.int8)[:, :T_pad]
        enhance = (gss_enhance_split
                   if self.config.compile_mode == 'fast_start'
                   else gss_enhance)
        N_dl, host_slice, trim_kw = self._plan_trim(trim, N, N_pad)
        x_hat, masks = enhance(
            padded, act, jnp.int32(target_index),
            config=self.config,
            start_context_frames=jnp.int32(start_context_frames),
            end_context_frames=jnp.int32(end_context_frames),
            num_valid_samples=jnp.int32(N),
            num_output_samples=N_pad,
            **trim_kw,
        )
        return x_hat, masks, N_dl, host_slice

    def dispatch_cached(self, cache, offsets, num_valid_samples,
                        activity_freq, target_index, *,
                        start_context_frames=0, end_context_frames=0,
                        trim=None):
        """Asynchronous dispatch with the observation sliced from a
        device-resident session-audio window (see
        :func:`gss_enhance_cached` and ``models/audio_cache.py``).

        ``cache`` is the (A*C, W) device array, ``offsets`` the per-array
        window starts, ``num_valid_samples`` the true (min-over-arrays)
        sample count.  Output is bit-identical to :meth:`dispatch` with
        the equivalent host-loaded observation.
        """
        N = int(num_valid_samples)
        N_pad = self.bucket_length(N)
        offsets = np.asarray(offsets, np.int32)
        W = cache.shape[1]
        assert offsets.min() >= 0 and offsets.max() + N_pad <= W, \
            (offsets, N_pad, W)
        T_pad = self.frame_count(N_pad)
        act = np.zeros((activity_freq.shape[0], T_pad), np.int8)
        act[:, :activity_freq.shape[1]] = np.asarray(activity_freq,
                                                     np.int8)[:, :T_pad]
        enhance = (gss_enhance_cached_split
                   if self.config.compile_mode == 'fast_start'
                   else gss_enhance_cached)
        N_dl, host_slice, trim_kw = self._plan_trim(trim, N, N_pad)
        x_hat, masks = enhance(
            cache, jnp.asarray(offsets), act, jnp.int32(target_index),
            config=self.config,
            num_arrays=len(offsets),
            slice_samples=N_pad,
            start_context_frames=jnp.int32(start_context_frames),
            end_context_frames=jnp.int32(end_context_frames),
            num_valid_samples=jnp.int32(N),
            num_output_samples=N_pad,
            **trim_kw,
        )
        return x_hat, masks, N_dl, host_slice

    def warmup(self, num_channels, num_classes, *, dtype=None,
               lengths=None, parallel=True, cache_window_samples=None,
               num_arrays=None, cache_lengths=None, trim_buckets=None):
        """Ahead-of-time compile the enhancement programs for every
        length bucket.

        In ``compile_mode='fast_start'`` the three stage programs are
        lowered and compiled CONCURRENTLY on a thread pool (XLA releases
        the GIL), cutting fresh-machine first-utterance latency well
        below the fused program's single cold compile.

        When ``cache_window_samples`` (and ``num_arrays``) are given, the
        session-audio-cache variants (:func:`gss_enhance_cached` /
        :func:`_gss_front_cached`) are compiled too — for
        ``cache_lengths`` (default: ``lengths``; pass only the buckets
        that actually fit the window).

        ``trim_buckets``: iterable of (bucket_samples, output_samples)
        pairs — the device-trim program variants a session with
        ``device_trim`` will dispatch (see :meth:`_plan_trim`;
        ``Enhancer.warmup`` derives the pairs from the session's real
        utterance lengths).
        """
        import concurrent.futures

        dtype = np.dtype(dtype if dtype is not None else self.dtype)
        lengths = sorted({self.bucket_length(n) for n in (
            lengths if lengths is not None else self.length_buckets or ())})
        trim_by_bucket = {}
        for n_pad, out_pad in (trim_buckets or ()):
            trim_by_bucket.setdefault(int(n_pad), set()).add(int(out_pad))
        config = self.config
        i32 = jax.ShapeDtypeStruct((), jnp.int32)
        jobs = []
        if cache_window_samples is not None:
            A = num_arrays if num_arrays is not None else 1
            cache_s = jax.ShapeDtypeStruct(
                (num_channels, cache_window_samples), dtype)
            offs_s = jax.ShapeDtypeStruct((A,), jnp.int32)
            cached_bucket_lengths = sorted(
                {self.bucket_length(n) for n in (
                    cache_lengths if cache_lengths is not None
                    else lengths)})
            for N_pad in cached_bucket_lengths:
                T_pad = self.frame_count(N_pad)
                act_s = jax.ShapeDtypeStruct(
                    (num_classes, T_pad), jnp.int8)
                if config.compile_mode == 'fast_start':
                    jobs.append(
                        lambda cs=cache_s, os_=offs_s, c=config, a=A,
                        n=N_pad: _gss_front_cached.lower(
                            cs, os_, i32, config=c, num_arrays=a,
                            slice_samples=n).compile())
                else:
                    for out_pad in (None, *sorted(
                            trim_by_bucket.get(N_pad, ()))):
                        jobs.append(
                            lambda cs=cache_s, os_=offs_s, ac=act_s,
                            c=config, a=A, n=N_pad, t=out_pad:
                            gss_enhance_cached.lower(
                                cs, os_, ac, i32, config=c, num_arrays=a,
                                slice_samples=n,
                                start_context_frames=i32,
                                end_context_frames=i32,
                                num_valid_samples=i32,
                                num_output_samples=n,
                                **({} if t is None else dict(
                                    output_trim_start=i32,
                                    output_trim_samples=t)),
                            ).compile())
        for N_pad in lengths:
            T_pad = self.frame_count(N_pad)
            F = config.stft_size // 2 + 1
            obs_s = jax.ShapeDtypeStruct((num_channels, N_pad), dtype)
            act_s = jax.ShapeDtypeStruct((num_classes, T_pad), jnp.int8)
            if config.compile_mode == 'fast_start':
                cdtype = jnp.complex64 if dtype != np.float64 \
                    else jnp.complex128
                obs_f = jax.ShapeDtypeStruct(
                    (F, num_channels, T_pad), cdtype)
                fm_s = jax.ShapeDtypeStruct((T_pad,), jnp.bool_)
                masks_s = jax.ShapeDtypeStruct(
                    (F, num_classes, T_pad),
                    jnp.float32 if dtype != np.float64 else jnp.float64)
                jobs += [
                    lambda o=obs_s, c=config: _gss_front.lower(
                        o, i32, config=c).compile(),
                    lambda o=obs_f, a=act_s, f=fm_s, c=config:
                        _gss_em.lower(o, a, f, config=c).compile(),
                ]
                for out_pad in (None, *sorted(
                        trim_by_bucket.get(N_pad, ()))):
                    jobs.append(
                        lambda o=obs_f, m=masks_s, f=fm_s, c=config,
                        n=N_pad, t=out_pad:
                            _gss_back.lower(
                                o, m, i32, i32, i32, f, config=c,
                                num_output_samples=n,
                                **({} if t is None else dict(
                                    output_trim_start=i32,
                                    output_trim_samples=t)),
                            ).compile())
            else:
                for out_pad in (None, *sorted(
                        trim_by_bucket.get(N_pad, ()))):
                    jobs.append(
                        lambda o=obs_s, a=act_s, c=config, n=N_pad,
                        t=out_pad:
                            gss_enhance.lower(
                                o, a, i32, config=c,
                                start_context_frames=i32,
                                end_context_frames=i32,
                                num_valid_samples=i32,
                                num_output_samples=n,
                                **({} if t is None else dict(
                                    output_trim_start=i32,
                                    output_trim_samples=t)),
                            ).compile())
        if parallel:
            with concurrent.futures.ThreadPoolExecutor(
                    max_workers=max(1, len(jobs))) as pool:
                list(pool.map(lambda j: j(), jobs))
        else:
            for j in jobs:
                j()

    def debug(self, obs, activity_freq, target_index, *,
              start_context_frames=0, end_context_frames=0):
        """Synchronous debug call (same padding/bucketing as
        :meth:`dispatch`): returns (x_hat, masks, debug dict of numpy
        arrays) — per-EM-iteration weights / logdet / condition proxy /
        posterior entropy (see :func:`gss_enhance_debug`)."""
        obs = self._normalize_obs(obs)
        D, N = obs.shape
        N_pad = self.bucket_length(N)
        T_pad = self.frame_count(N_pad)
        padded = np.zeros((D, N_pad), obs.dtype)
        padded[:, :N] = obs
        act = np.zeros((activity_freq.shape[0], T_pad), np.int8)
        act[:, :activity_freq.shape[1]] = np.asarray(activity_freq,
                                                     np.int8)[:, :T_pad]
        x_hat, masks, debug = gss_enhance_debug(
            padded, act, jnp.int32(target_index),
            config=self.config,
            start_context_frames=jnp.int32(start_context_frames),
            end_context_frames=jnp.int32(end_context_frames),
            num_valid_samples=jnp.int32(N),
            num_output_samples=N_pad,
        )
        return (np.asarray(x_hat)[:N], np.asarray(masks),
                {k: np.asarray(v) for k, v in debug.items()})

    def warmup_mesh(self, mesh, num_channels, num_classes, *,
                    dtype=None, lengths=None, utterances_per_device=1,
                    parallel=True, cache_window_samples=None,
                    num_arrays=None, cache_lengths=None):
        """Ahead-of-time compile the SHARDED batch programs the mesh
        session loop dispatches (``parallel.mesh.sharded_gss_fn`` /
        ``sharded_gss_cached_fn``) for every length bucket — the mesh
        twin of :meth:`warmup` (VERDICT r3 weak #2: without this, every
        mesh session paid a cold sharded-program compile per
        (D, N_pad, K) group at dispatch time).

        AOT ``lower().compile()`` populates the same executable cache
        later calls hit (verified: a warmed program triggers zero new
        compilations), so the batch dispatcher's first group runs at
        full speed.
        """
        import concurrent.futures

        from pb_chime5_tpu.parallel.mesh import (
            sharded_gss_fn, sharded_gss_cached_fn)

        dtype = np.dtype(dtype if dtype is not None else self.dtype)
        B = mesh.shape['data'] * utterances_per_device
        lengths = sorted({self.bucket_length(n) for n in (
            lengths if lengths is not None else self.length_buckets or ())})
        config = self.config
        i32b = jax.ShapeDtypeStruct((B,), jnp.int32)
        jobs = []
        for N_pad in lengths:
            T_pad = self.frame_count(N_pad)
            obs_s = jax.ShapeDtypeStruct((B, num_channels, N_pad), dtype)
            act_s = jax.ShapeDtypeStruct((B, num_classes, T_pad),
                                         jnp.int8)
            fn = sharded_gss_fn(mesh, config, N_pad)
            jobs.append(
                lambda f=fn, o=obs_s, a=act_s:
                    f.lower(o, a, i32b, i32b, i32b, i32b).compile())
        if cache_window_samples is not None:
            A = num_arrays if num_arrays is not None else 1
            cache_s = jax.ShapeDtypeStruct(
                (num_channels, cache_window_samples), dtype)
            offs_s = jax.ShapeDtypeStruct((B, A), jnp.int32)
            for N_pad in sorted({self.bucket_length(n) for n in (
                    cache_lengths if cache_lengths is not None
                    else lengths)}):
                T_pad = self.frame_count(N_pad)
                act_s = jax.ShapeDtypeStruct((B, num_classes, T_pad),
                                             jnp.int8)
                fnc = sharded_gss_cached_fn(mesh, config, A, N_pad, N_pad)
                jobs.append(
                    lambda f=fnc, cs=cache_s, os_=offs_s, a=act_s:
                        f.lower(cs, os_, a, i32b, i32b, i32b,
                                i32b).compile())
        if parallel:
            with concurrent.futures.ThreadPoolExecutor(
                    max_workers=max(1, len(jobs))) as pool:
                list(pool.map(lambda j: j(), jobs))
        else:
            for j in jobs:
                j()

    @staticmethod
    def gather(handle, return_masks=False):
        x_hat, masks, N, *rest = handle
        sl = rest[0] if rest else slice(None)
        x = np.asarray(x_hat)[:N][sl]
        return (x, np.asarray(masks)) if return_masks else x

    def __call__(self, obs, activity_freq, target_index, *,
                 start_context_frames=0, end_context_frames=0,
                 return_masks=False):
        """Synchronous call: returns (x_hat, masks); ``masks`` is None
        unless ``return_masks`` — downloading the (K, T, F) posterior
        tensor costs far more than the enhancement itself on a slow
        host<->device link."""
        handle = self.dispatch(
            obs, activity_freq, target_index,
            start_context_frames=start_context_frames,
            end_context_frames=end_context_frames)
        if return_masks:
            return self.gather(handle, return_masks=True)
        return self.gather(handle), None
