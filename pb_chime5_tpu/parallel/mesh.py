"""Device-mesh sharding of the enhancement pipeline.

Two genuine parallel axes for this workload:

* ``data`` — utterances are independent (the reference's only parallelism,
  via MPI processes; here chips).  No cross-device communication.
* ``freq`` — inside one utterance, WPE / cacGMM EM / PSDs are independent
  per frequency bin (the reference runs a Python loop over 513 bins,
  core.py:171-206).  Sharding F over chips cuts single-utterance latency;
  the only cross-shard communication is (a) a psum of the MVDR
  reference-channel SNR statistics and (b) the final all-gather of the
  beamformed spectrogram for the iSTFT — both tiny, riding ICI.

``sharded_gss_enhance`` runs a (B, D, N) utterance batch over a
``Mesh(('data', 'freq'))``: B is split over ``data``, the 513-bin
frequency axis (zero-padded to a multiple) over ``freq``.

Per-example dynamic quantities (target index, valid sample count, context
frame counts for ``bf_drop_context``) ride along as (B,) arrays, so one
compiled program serves a whole length bucket — exactly like the
single-utterance fused program in ``models/gss.py``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pb_chime5_tpu.models.gss import (
    GssConfig, enhance_spectrogram, _stft_and_mask, _slice_cached_obs)
from pb_chime5_tpu.ops.stft import istft

__all__ = ['make_mesh', 'batched_gss_enhance', 'sharded_gss_enhance',
           'sharded_gss_enhance_cached', 'sharded_gss_fn',
           'sharded_gss_cached_fn']


def make_mesh(data: int = None, freq: int = 1, devices=None) -> Mesh:
    """Mesh with ('data', 'freq') axes over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % freq == 0, (n, freq)
        data = n // freq
    assert data * freq <= n, (data, freq, n)
    dev_array = np.asarray(devices[:data * freq]).reshape(data, freq)
    return Mesh(dev_array, ('data', 'freq'))


def _single(obs, activity_freq, target_index, num_valid_samples,
            start_context_frames, end_context_frames, config,
            num_output_samples, snr_reduce=None, freq_pad=0,
            num_freq_shards=1):
    """One utterance, optionally on a frequency shard (inside shard_map).

    STFT framing, int16 scaling and the valid-frame mask are the SAME
    code as the single-utterance program (models/gss._stft_and_mask) —
    one definition, no drift.
    """
    size, shift = config.stft_size, config.stft_shift
    Obs, frame_mask, _ = _stft_and_mask(obs, num_valid_samples, config)

    if freq_pad:
        Obs = jnp.pad(Obs, ((0, freq_pad), (0, 0), (0, 0)))

    if snr_reduce is not None:
        # take this device's frequency block
        fi = jax.lax.axis_index('freq')
        f_block = Obs.shape[0] // num_freq_shards
        Obs = jax.lax.dynamic_slice_in_dim(Obs, fi * f_block, f_block,
                                           axis=0)

    X_hat, _ = enhance_spectrogram(
        Obs, activity_freq, target_index,
        config=config,
        start_context_frames=start_context_frames,
        end_context_frames=end_context_frames,
        frame_mask=frame_mask, snr_reduce=snr_reduce)

    if snr_reduce is not None:
        # reassemble the full frequency axis on every device
        X_hat = jax.lax.all_gather(X_hat, 'freq', axis=0, tiled=True)
    F = size // 2 + 1
    X_hat = X_hat[:F]

    return istft(X_hat.T, size, shift, fading=config.stft_fading,
                 num_samples=num_output_samples)


def _zeros_like_batch(x, reference):
    return jnp.zeros((np.shape(reference)[0],), jnp.int32) if x is None \
        else jnp.asarray(x, jnp.int32)


@functools.partial(
    jax.jit, static_argnames=('config', 'num_output_samples'))
def _batched_impl(obs, activity_freq, target_index, num_valid_samples,
                  start_context_frames, end_context_frames, *,
                  config: GssConfig, num_output_samples: int):
    fn = functools.partial(_single, config=config,
                           num_output_samples=num_output_samples)
    return jax.vmap(fn)(obs, activity_freq, target_index,
                        num_valid_samples, start_context_frames,
                        end_context_frames)


def batched_gss_enhance(obs, activity_freq, target_index,
                        num_valid_samples, *, config: GssConfig,
                        num_output_samples: int,
                        start_context_frames=None,
                        end_context_frames=None):
    """vmap over a same-shape utterance batch, single device.

    obs (B, D, N), activity_freq (B, K, T), target_index (B,),
    num_valid_samples (B,), optional start/end_context_frames (B,)
    -> (B, num_output_samples).
    """
    return _batched_impl(
        obs, activity_freq, target_index, num_valid_samples,
        _zeros_like_batch(start_context_frames, obs),
        _zeros_like_batch(end_context_frames, obs),
        config=config, num_output_samples=num_output_samples)


@functools.lru_cache(maxsize=None)
def sharded_gss_fn(mesh: Mesh, config: GssConfig,
                   num_output_samples: int):
    """The compiled-callable factory behind :func:`sharded_gss_enhance`.

    Hoisted to a module-level ``lru_cache`` keyed on the STATIC
    quantities (mesh, config, output length) so every batch the session
    loop dispatches reuses one traced/compiled executable — a fresh
    closure + ``jax.jit`` per call would retrace per batch (ADVICE r3).
    The cached callable is also what mesh WARMUP lowers ahead of time
    (``GssPipeline.warmup_mesh``).
    """
    nf = mesh.shape['freq']
    F = config.stft_size // 2 + 1
    freq_pad = (-F) % nf
    snr_reduce = (lambda x: jax.lax.psum(x, 'freq')) if nf > 1 else None

    def per_device(obs_l, act_l, tgt_l, valid_l, scf_l, ecf_l):
        fn = functools.partial(
            _single, config=config,
            num_output_samples=num_output_samples,
            snr_reduce=snr_reduce, freq_pad=freq_pad if nf > 1 else 0,
            num_freq_shards=nf)
        return jax.vmap(fn)(obs_l, act_l, tgt_l, valid_l, scf_l, ecf_l)

    shard = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P('data'), P('data'), P('data'), P('data'), P('data'),
                  P('data')),
        out_specs=P('data'),
        check_vma=False,
    )
    return jax.jit(shard)


def sharded_gss_enhance(mesh: Mesh, obs, activity_freq, target_index,
                        num_valid_samples, *, config: GssConfig,
                        num_output_samples: int,
                        start_context_frames=None,
                        end_context_frames=None):
    """Data x frequency sharded batch enhancement over ``mesh``.

    obs (B, D, N) with B divisible by the ``data`` axis size.  Returns
    (B, num_output_samples) sharded over ``data``.
    """
    nd = mesh.shape['data']
    B = obs.shape[0]
    assert B % nd == 0, (B, nd)
    fn = sharded_gss_fn(mesh, config, num_output_samples)
    return fn(
        obs, activity_freq, target_index, num_valid_samples,
        _zeros_like_batch(start_context_frames, obs),
        _zeros_like_batch(end_context_frames, obs))


@functools.lru_cache(maxsize=None)
def sharded_gss_cached_fn(mesh: Mesh, config: GssConfig,
                          num_arrays: int, slice_samples: int,
                          num_output_samples: int):
    """Cached-callable factory behind :func:`sharded_gss_enhance_cached`
    (same rationale as :func:`sharded_gss_fn`)."""
    nf = mesh.shape['freq']
    F = config.stft_size // 2 + 1
    freq_pad = (-F) % nf
    snr_reduce = (lambda x: jax.lax.psum(x, 'freq')) if nf > 1 else None

    def per_device(cache_l, offs_l, act_l, tgt_l, valid_l, scf_l, ecf_l):
        rows = [
            _slice_cached_obs(cache_l, offs_l[b], num_arrays,
                              slice_samples, valid_l[b])
            for b in range(offs_l.shape[0])]
        obs_l = jnp.stack(rows)
        fn = functools.partial(
            _single, config=config,
            num_output_samples=num_output_samples,
            snr_reduce=snr_reduce, freq_pad=freq_pad if nf > 1 else 0,
            num_freq_shards=nf)
        return jax.vmap(fn)(obs_l, act_l, tgt_l, valid_l, scf_l, ecf_l)

    shard = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P('data'), P('data'), P('data'), P('data'),
                  P('data'), P('data')),
        out_specs=P('data'),
        check_vma=False,
    )
    return jax.jit(shard)


def sharded_gss_enhance_cached(
        mesh: Mesh, cache, offsets, activity_freq, target_index,
        num_valid_samples, *, config: GssConfig, num_arrays: int,
        slice_samples: int, num_output_samples: int,
        start_context_frames=None, end_context_frames=None):
    """:func:`sharded_gss_enhance` fed from the device-resident
    session-audio window (models/audio_cache.py): the (A*C, W) window is
    REPLICATED across the mesh and each row ships only its (A,) int32
    per-array offsets — the multi-chip twin of
    ``models.gss.gss_enhance_cached``.

    The per-row observation is assembled inside ``shard_map`` by a
    STATIC Python loop over the local rows (vmapping the dynamic slice
    would lower it to a gather — the 10-70 ms axon pitfall; B_local
    contiguous traced-offset slices are ~free).  Samples past each row's
    valid length are zeroed in-graph, so rows are bit-identical to the
    direct path's zero-padded uploads.

    offsets (B, A) int32, B divisible by the ``data`` axis size.
    Returns (B, num_output_samples) sharded over ``data``.
    """
    nd = mesh.shape['data']
    B = offsets.shape[0]
    assert B % nd == 0, (B, nd)
    fn = sharded_gss_cached_fn(mesh, config, num_arrays, slice_samples,
                               num_output_samples)
    return fn(
        cache, offsets, activity_freq, target_index, num_valid_samples,
        _zeros_like_batch(start_context_frames, offsets),
        _zeros_like_batch(end_context_frames, offsets))
