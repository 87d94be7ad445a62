"""Device-resident rolling session-audio cache.

The reference re-reads every utterance's +-15 s acoustic context from the
session recordings (core.py:439-488, ``AddContext`` database.py:713-1053);
the direct TPU path mirrors that with a per-utterance host->device upload.
Consecutive utterances of a session overlap so heavily (10 s utterance +
30 s context) that per-utterance upload moves ~4x more bytes over
PCIe/tunnel than the session contains.

This cache keeps a rolling window of the session audio resident on the
device and turns each dispatch into A int32 offsets
(:func:`pb_chime5_tpu.models.gss.gss_enhance_cached` slices the window
in-graph; contiguous traced-offset slices are ~free on the axon runtime,
unlike traced-index gathers).  Outputs are BIT-IDENTICAL to the direct
path: the slice is the same file content, and samples beyond the valid
length are zeroed in-graph exactly where the direct path zero-pads.

Policy per example (:meth:`SessionAudioCache.lookup`):

* window hit -> (device window, per-array offsets, valid length)
* miss -> refill the window starting at this example's spans
* a refill is WASTEFUL when the hits it served moved fewer samples than
  the window upload itself (sparse sessions, unordered schedules,
  backward seeks).  Two consecutive wasteful refills disable the cache
  for the rest of the session and the caller falls back to direct
  upload — the cache can never lose more than ~two window uploads
* utterance longer than the window, or a compute dtype the in-graph
  scaling path does not cover -> direct upload
"""

import time

import numpy as np

from pb_chime5_tpu.io import audio_length, load_audio

__all__ = ['SessionAudioCache', 'CachedWindow']


class CachedWindow(tuple):
    """(device window (A*C, W), offsets (A,) int32, num_valid_samples) —
    marker type so the dispatch path can distinguish a cached lookup
    from a host-loaded observation array."""
    __slots__ = ()

    def __new__(cls, buf, offsets, num_valid_samples):
        return tuple.__new__(cls, (buf, offsets, num_valid_samples))

    @property
    def buf(self):
        return self[0]

    @property
    def offsets(self):
        return self[1]

    @property
    def num_valid_samples(self):
        return self[2]


class SessionAudioCache:
    """See the module docstring.

    Args:
      window_seconds: resident window length W.  Amortized upload for a
        long session is ``session_bytes * W / (W - max_utterance)``;
        180 s against <= 42 s windows is a ~1.3x overhead on the session
        bytes vs ~4x for per-utterance upload.
      margin_seconds: window starts this much before the first requested
        span, so small backward wobbles (equal_start_context, clock
        drift) stay inside the window.
      coerce: maps the host-read (C, n) array to the upload dtype —
        pass the pipeline's ``_normalize_obs`` so cached and direct
        uploads are bitwise the same dtype conversion.
      bucket_length: the pipeline's bucket function (the containment
        check must use the PADDED slice length).
      sample_rate: only used to convert the second-based sizes.
    """

    def __init__(self, *, window_seconds=180.0, margin_seconds=1.0,
                 sample_rate=16000, coerce=None, bucket_length=None,
                 device_put=None):
        self.window = int(window_seconds * sample_rate)
        self.margin = int(margin_seconds * sample_rate)
        self.coerce = coerce if coerce is not None else (lambda a: a)
        self.bucket_length = bucket_length if bucket_length is not None \
            else (lambda n: n)
        if device_put is None:
            import jax
            device_put = jax.device_put
        self.device_put = device_put
        self._key = None
        self._bases = None
        self._buf = None
        self._disabled = False
        self._wasteful_refills = 0
        self._hit_samples_since_refill = 0
        self._length_cache = {}
        self.stats = {'hits': 0, 'refills': 0, 'direct': 0,
                      'refill_mb': 0.0, 'refill_s': 0.0}

    # -- helpers ----------------------------------------------------------

    def _file_length(self, paths):
        """Min length over the per-channel files of one array."""
        key = tuple(paths) if isinstance(paths, (list, tuple)) else paths
        if key not in self._length_cache:
            if isinstance(paths, (list, tuple)):
                self._length_cache[key] = min(
                    audio_length(p) for p in paths)
            else:
                self._length_cache[key] = audio_length(paths)
        return self._length_cache[key]

    def _refill(self, per_array, starts):
        # timed (host read + device_put together): 'refill_s'/'refill_mb'
        # in the stats line attribute the session's upload cost so a
        # transfer-bound wall clock is observable, not inferred
        t0 = time.perf_counter()
        self._bases = [max(0, s - self.margin) for s in starts]
        rows = []
        for (paths, _s, _e, selector), base in zip(per_array, self._bases):
            # fill_value=0 pads session-tail short reads to exactly
            # `window` samples, so every row is (C, window)
            audio = load_audio(paths, start=base, stop=base + self.window,
                               dtype=None, fill_value=0)
            rows.append(self.coerce(np.atleast_2d(audio)[selector]))
        host = np.concatenate(rows, axis=0)
        self._buf = self.device_put(host)
        if hasattr(self._buf, 'block_until_ready'):
            # device_put is async; block here (on the prefetch thread —
            # the consumer would block on first use anyway) so refill_s
            # measures the actual transfer, not the enqueue
            self._buf.block_until_ready()
        self.stats['refills'] += 1
        self.stats['refill_mb'] += round(host.nbytes / 1e6, 3)
        self.stats['refill_s'] += round(time.perf_counter() - t0, 4)

    # -- public -----------------------------------------------------------

    def new_run(self):
        """Forget the policy verdict and the resident window.

        A new ``enhance_session`` call is a new schedule (a re-run may
        use a different slice, order, or shard), so a previous run's
        wasteful-schedule disable must not leak into it; the next
        ``lookup`` starts from a clean slate.  Costs nothing when the
        cache was healthy (the stale window would miss anyway)."""
        self._key = None

    def lookup(self, session_key, per_array):
        """per_array: list of (paths, start, stop, channel_selector) in
        array order.  Returns a :class:`CachedWindow` or None (caller
        falls back to the direct per-utterance upload)."""
        if session_key != self._key:
            self._key = session_key
            self._bases = None
            self._buf = None
            self._disabled = False
            self._wasteful_refills = 0
            self._hit_samples_since_refill = 0
        if self._disabled:
            self.stats['direct'] += 1
            return None

        starts = [s for (_p, s, _e, _sel) in per_array]
        # the valid length mirrors the direct path's min-over-arrays
        # truncation, including short reads at the session tail
        N = min(min(e, self._file_length(p) ) - s
                for (p, s, e, _sel) in per_array)
        if N <= 0:
            self.stats['direct'] += 1
            return None
        N_pad = self.bucket_length(N)
        if N_pad + self.margin > self.window:
            self.stats['direct'] += 1
            return None                      # utterance too long to cache

        hit = self._bases is not None and all(
            s >= b and s - b + N_pad <= self.window
            for s, b in zip(starts, self._bases))
        if hit:
            self._hit_samples_since_refill += N_pad
            self.stats['hits'] += 1
        else:
            # was the previous window worth its upload?  A refill pays
            # ~window samples per row; the hits it served saved ~N_pad
            # samples per row each.  (The first fill has no predecessor.)
            if self._bases is not None:
                if self._hit_samples_since_refill < self.window:
                    self._wasteful_refills += 1
                else:
                    self._wasteful_refills = 0
                if self._wasteful_refills >= 2:
                    # sparse or unordered schedule: direct upload moves
                    # fewer bytes — give up for this session
                    self._disabled = True
                    self._buf = None
                    self.stats['direct'] += 1
                    return None
            self._hit_samples_since_refill = 0
            self._refill(per_array, starts)
        offsets = np.asarray(
            [s - b for s, b in zip(starts, self._bases)], np.int32)
        return CachedWindow(self._buf, offsets, N)
