"""Batch collation driver: feeds the session loop onto a device mesh.

This is the glue between the host-side session iteration
(``Enhancer.enhance_session``) and the sharded batch program
(``parallel.mesh.sharded_gss_enhance``): utterances are collated into
same-shape groups — key (channels, bucketed length, classes) — and each
full group is dispatched as ONE ``shard_map`` program over the
``('data', 'freq')`` mesh, so every chip of a slice works on its own
utterances simultaneously.  This realizes the reference's scale-out story
(MPI utterance parallelism over 600 cores, reference core.py:381,
README.md:108-113) *inside one process*: chips replace workers, a batch
row replaces an MPI rank's current utterance.

Numerics are identical to the serial path: both run the same
``enhance_spectrogram`` / ``_stft_and_mask`` code (models/gss.py) on the
same padded bucket shapes, with per-row valid-sample masks, target
indices and context-drop frame counts as traced (B,) arrays.

Partial groups (end of session, rare shapes) are padded by repeating the
first row; padded rows are dropped on gather.
"""

import dataclasses

import numpy as np

from pb_chime5_tpu.parallel.mesh import (
    sharded_gss_enhance, sharded_gss_enhance_cached)

__all__ = ['BatchDispatcher', 'DispatchedBatch']


@dataclasses.dataclass
class _PendingItem:
    tag: object              # caller's cookie (e.g. example dict)
    num_valid_samples: int   # true length before bucket padding
    obs: np.ndarray          # (D, N) normalized; None for cached items
    activity: np.ndarray     # (K, T_pad) int8
    target_index: int
    start_context_frames: int
    end_context_frames: int
    offsets: np.ndarray = None   # (A,) int32 for session-cache items


@dataclasses.dataclass
class DispatchedBatch:
    """One in-flight sharded program: ``handle`` is the (B, N_pad) device
    array (dispatch is async), ``items`` the row metadata of the real
    (non-padding) rows."""
    handle: object
    items: list              # list of _PendingItem (padding rows dropped)

    def gather(self):
        """Block on the device result; yields (tag, x_hat[:valid])."""
        out = np.asarray(self.handle)
        for row, item in zip(out, self.items):
            yield item.tag, row[:item.num_valid_samples]


class BatchDispatcher:
    """Collates utterances into mesh-wide batches.

    ``pipeline`` supplies the static config, the length buckets and the
    observation dtype normalization (a ``models.gss.GssPipeline``) — the
    same quantization/bucketing decisions as the serial path, so outputs
    match bit-for-bit.

    ``utterances_per_device`` rows are stacked per chip along the data
    axis: 1 (default) minimizes latency; >1 amortizes per-program
    overhead when utterances are short.
    """

    def __init__(self, mesh, pipeline, *, utterances_per_device=1):
        assert utterances_per_device >= 1, utterances_per_device
        self.mesh = mesh
        self.pipeline = pipeline
        self.batch_size = mesh.shape['data'] * utterances_per_device
        self._groups = {}        # (D, N_pad, K) -> [_PendingItem]
        self._windows = {}       # cached-group key -> device window

    # ------------------------------------------------------------- add --

    def add(self, obs, activity_freq, target_index, *,
            start_context_frames=0, end_context_frames=0, tag=None):
        """Queue one utterance; returns a DispatchedBatch when this
        addition filled a group, else None."""
        obs = self.pipeline._normalize_obs(obs)
        D, N = obs.shape
        N_pad = self.pipeline.bucket_length(N)
        T_pad = self.pipeline.frame_count(N_pad)
        padded = np.zeros((D, N_pad), obs.dtype)
        padded[:, :N] = obs
        act = np.zeros((activity_freq.shape[0], T_pad), np.int8)
        act[:, :activity_freq.shape[1]] = np.asarray(
            activity_freq, np.int8)[:, :T_pad]
        item = _PendingItem(
            tag=tag, num_valid_samples=N, obs=padded, activity=act,
            target_index=int(target_index),
            start_context_frames=int(start_context_frames),
            end_context_frames=int(end_context_frames))
        key = (D, N_pad, act.shape[0])
        group = self._groups.setdefault(key, [])
        group.append(item)
        if len(group) >= self.batch_size:
            del self._groups[key]
            return self._dispatch(key, group)
        return None

    def add_cached(self, window, offsets, num_valid_samples,
                   activity_freq, target_index, *,
                   start_context_frames=0, end_context_frames=0,
                   tag=None):
        """Queue one utterance served by the device-resident
        session-audio window (models/audio_cache.py): ships (A,) int32
        offsets instead of the (D, N) observation.  Rows of one batch
        must share the same window, so the group key carries the window
        identity — a refill simply starts a new group and the old one
        flushes with its own (still-alive) buffer."""
        N = int(num_valid_samples)
        N_pad = self.pipeline.bucket_length(N)
        T_pad = self.pipeline.frame_count(N_pad)
        act = np.zeros((activity_freq.shape[0], T_pad), np.int8)
        act[:, :activity_freq.shape[1]] = np.asarray(
            activity_freq, np.int8)[:, :T_pad]
        offsets = np.asarray(offsets, np.int32)
        W = window.shape[1]
        assert offsets.min() >= 0 and offsets.max() + N_pad <= W, \
            (offsets, N_pad, W)   # dynamic_slice would silently clamp
        item = _PendingItem(
            tag=tag, num_valid_samples=N, obs=None, activity=act,
            target_index=int(target_index),
            start_context_frames=int(start_context_frames),
            end_context_frames=int(end_context_frames),
            offsets=offsets)
        key = ('cached', id(window), len(offsets), N_pad, act.shape[0])
        group = self._groups.setdefault(key, [])
        # keep the device buffer alive for as long as the group exists
        self._windows[key] = window
        group.append(item)
        if len(group) >= self.batch_size:
            del self._groups[key]
            return self._dispatch(key, group)
        return None

    def flush(self):
        """Dispatch every partial group; returns a list of
        DispatchedBatch."""
        batches = [self._dispatch(key, group)
                   for key, group in self._groups.items()]
        self._groups.clear()
        return batches

    @property
    def pending_count(self):
        return sum(len(g) for g in self._groups.values())

    # -------------------------------------------------------- dispatch --

    def _dispatch(self, key, items):
        import jax.numpy as jnp

        if key[0] == 'cached':
            return self._dispatch_cached(key, items)
        D, N_pad, K = key
        B = self.batch_size
        rows = items + [items[0]] * (B - len(items))   # pad partial batch
        obs_b = np.stack([r.obs for r in rows])
        act_b = np.stack([r.activity for r in rows])
        tgt_b = np.array([r.target_index for r in rows], np.int32)
        valid_b = np.array([r.num_valid_samples for r in rows], np.int32)
        scf_b = np.array([r.start_context_frames for r in rows], np.int32)
        ecf_b = np.array([r.end_context_frames for r in rows], np.int32)
        handle = sharded_gss_enhance(
            self.mesh, jnp.asarray(obs_b), jnp.asarray(act_b),
            jnp.asarray(tgt_b), jnp.asarray(valid_b),
            config=self.pipeline.config, num_output_samples=N_pad,
            start_context_frames=jnp.asarray(scf_b),
            end_context_frames=jnp.asarray(ecf_b))
        return DispatchedBatch(handle=handle, items=items)

    def _dispatch_cached(self, key, items):
        import jax.numpy as jnp

        _tag, _wid, A, N_pad, K = key
        window = self._windows.pop(key)
        B = self.batch_size
        rows = items + [items[0]] * (B - len(items))   # pad partial batch
        offs_b = np.stack([r.offsets for r in rows])
        act_b = np.stack([r.activity for r in rows])
        tgt_b = np.array([r.target_index for r in rows], np.int32)
        valid_b = np.array([r.num_valid_samples for r in rows], np.int32)
        scf_b = np.array([r.start_context_frames for r in rows], np.int32)
        ecf_b = np.array([r.end_context_frames for r in rows], np.int32)
        handle = sharded_gss_enhance_cached(
            self.mesh, window, jnp.asarray(offs_b), jnp.asarray(act_b),
            jnp.asarray(tgt_b), jnp.asarray(valid_b),
            config=self.pipeline.config, num_arrays=A,
            slice_samples=N_pad, num_output_samples=N_pad,
            start_context_frames=jnp.asarray(scf_b),
            end_context_frames=jnp.asarray(ecf_b))
        return DispatchedBatch(handle=handle, items=items)
