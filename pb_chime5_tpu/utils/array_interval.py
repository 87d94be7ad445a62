"""Sparse boolean 1-D array stored as sorted (start, stop) intervals.

Same capability as the reference's ``ArrayIntervall``
(pb_chime5/utils/intervall_array.py:103-455): a 2.5 h session's
per-speaker activity track is O(#intervals) instead of O(#samples), with
slice get/set, construction from dense arrays / interval strings / RTTM
files, and pickling through the compact string form.

The hot interval algebra (intersection, non-intersection, parsing) lives in
``_interval_ops`` — a C++ extension built from cpp/interval_ops.cpp with a
pure-Python fallback (this file) when the extension is not compiled.  The
reference used Cython for the same reason
(pb_chime5/utils/intervall_array_util.pyx).
"""

import collections
from pathlib import Path

import numpy as np

try:
    from pb_chime5_tpu.utils import _interval_ops as _ops
    HAVE_NATIVE = True
except ImportError:
    _ops = None
    HAVE_NATIVE = False

__all__ = ['ArrayInterval', 'array_interval_from_str',
           'array_intervals_from_rttm', 'HAVE_NATIVE']


# --------------------------------------------------------------------------
# interval algebra (pure-Python fallbacks; the C++ extension mirrors these)
# --------------------------------------------------------------------------

def _py_intersection(interval, intervals):
    start, end = interval
    out = []
    for i_start, i_end in intervals:
        s = max(start, i_start)
        e = min(end, i_end)
        if s < e:
            out.append((s, e))
    return tuple(out)


def _py_non_intersection(interval, intervals):
    """Set subtraction: remove [start, end) from every interval.

    Note: the reference's cy_non_intersection (intervall_array_util.pyx:
    9-32) uses strict inequalities and silently keeps intervals whose
    boundary coincides with the cleared range (e.g. clearing [0, 50) from
    [0, 100) was a no-op); this is proper half-open subtraction.
    """
    start, end = interval
    out = []
    for i_start, i_end in intervals:
        if i_end <= start or i_start >= end:      # disjoint
            out.append((i_start, i_end))
            continue
        if i_start < start:                        # left remainder
            out.append((i_start, start))
        if i_end > end:                            # right remainder
            out.append((end, i_end))
    return tuple(out)


def _py_normalize(intervals):
    """Sort, drop empties, merge touching/overlapping intervals."""
    ivs = sorted((s, e) for s, e in intervals if s < e)
    out = []
    for s, e in ivs:
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return tuple(out)


def _py_str_to_intervals(string):
    out = []
    for part in string.replace(' ', '').strip(',').split(','):
        s, e = part.split(':')
        out.append((int(s), int(e)))
    return tuple(out)


if HAVE_NATIVE:
    _intersection = _ops.intersection
    _non_intersection = _ops.non_intersection
    _normalize = _ops.normalize
    _str_to_intervals = _ops.str_to_intervals
else:
    _intersection = _py_intersection
    _non_intersection = _py_non_intersection
    _normalize = _py_normalize
    _str_to_intervals = _py_str_to_intervals


def _parse_item(item, shape):
    if not isinstance(item, slice):
        raise AssertionError(
            f'Expected a slice, got {type(item).__name__}: {item!r}')
    assert item.step is None, (item, 'step is not supported')
    start = 0 if item.start is None else item.start
    if item.stop is None:
        assert shape is not None, 'open-ended slice needs a known shape'
        stop = shape[-1]
    else:
        stop = item.stop
    assert start >= 0 and stop >= 0, (start, stop, item)
    if shape is not None:
        assert start <= shape[-1] and stop <= shape[-1], (start, stop, shape)
    return start, stop


# --------------------------------------------------------------------------
# ArrayInterval
# --------------------------------------------------------------------------

def array_interval_from_str(string, shape):
    """'1:4, 5:20' -> ArrayInterval (inverse of ``_intervals_as_str``)."""
    ai = ArrayInterval(shape)
    if string:
        ai.intervals = ai.intervals + _str_to_intervals(string)
    return ai


class ArrayInterval:
    from_str = staticmethod(array_interval_from_str)

    def __init__(self, shape):
        if isinstance(shape, (int, np.integer)):
            shape = (int(shape),)
        if shape is not None:
            shape = tuple(int(s) for s in shape)
            assert len(shape) == 1, shape
        self.shape = shape
        self._intervals = ()
        self._normalized = True

    # ---- construction ----

    @staticmethod
    def from_array(array):
        array = np.asarray(array)
        assert array.ndim == 1, array.ndim
        assert array.dtype == bool, array.dtype
        diff = np.diff(array.astype(np.int8))
        rising = (np.nonzero(diff > 0)[0] + 1).tolist()
        falling = (np.nonzero(diff < 0)[0] + 1).tolist()
        if len(array) and array[0]:
            rising = [0] + rising
        if len(array) and array[-1]:
            falling = falling + [len(array)]
        ai = ArrayInterval(array.shape)
        ai.intervals = tuple(zip(rising, falling))
        return ai

    def __reduce__(self):
        return self.from_str, (
            self._intervals_as_str,
            None if self.shape is None else self.shape[-1],
        )

    # ---- interval state ----

    @property
    def intervals(self):
        return self._intervals

    @intervals.setter
    def intervals(self, value):
        self._intervals = tuple(value)
        self._normalized = False

    @property
    def normalized_intervals(self):
        if not self._normalized:
            self._intervals = _normalize(self._intervals)
            self._normalized = True
        return self._intervals

    @property
    def _intervals_as_str(self):
        return ', '.join(f'{s}:{e}' for s, e in self.normalized_intervals)

    def __repr__(self):
        return (f'{type(self).__name__}("{self._intervals_as_str}", '
                f'shape={self.shape})')

    def __len__(self):
        return self.shape[0]

    def __eq__(self, other):
        if not isinstance(other, ArrayInterval):
            return NotImplemented
        return (self.shape == other.shape
                and self.normalized_intervals == other.normalized_intervals)

    # ---- element access ----

    def add_intervals_from_str(self, string):
        self.intervals = self.intervals + _str_to_intervals(string)

    def add_intervals(self, slices):
        self.intervals = self.intervals + tuple(
            _parse_item(item, self.shape) for item in slices)

    def __setitem__(self, item, value):
        start, stop = _parse_item(item, self.shape)
        if np.isscalar(value) and value in (1, True):
            self.intervals = self.intervals + ((start, stop),)
        elif np.isscalar(value) and value in (0, False):
            self.intervals = _non_intersection((start, stop),
                                               self.normalized_intervals)
        elif isinstance(value, (tuple, list, np.ndarray)):
            value = np.asarray(value, dtype=bool)
            assert len(value) == stop - start, (start, stop, len(value))
            inner = ArrayInterval.from_array(value)
            remaining = _non_intersection((start, stop),
                                          self.normalized_intervals)
            self.intervals = remaining + tuple(
                (s + start, e + start) for s, e in inner.intervals)
        else:
            raise NotImplementedError(value)

    def __getitem__(self, item):
        start, stop = _parse_item(item, self.shape)
        hits = _intersection((start, stop), self.normalized_intervals)
        arr = np.zeros(stop - start, dtype=bool)
        for s, e in hits:
            arr[s - start:e - start] = True
        return arr

    def sum(self):
        """Total number of True samples — O(#intervals)."""
        return sum(e - s for s, e in self.normalized_intervals)


def array_intervals_from_rttm(rttm_file, shape=None, sample_rate=16000):
    """Parse an RTTM file into {file_id: {speaker: ArrayInterval}}.

    RTTM line format (Kaldi CHiME-6 recipe):
      SPEAKER <file-id> <chan> <begin-time> <duration> <NA> <NA> <name> <NA>
    Times are seconds; they must land on integer sample counts (the
    reference asserts the same, intervall_array.py:96-99).
    """
    import decimal
    lines = Path(rttm_file).read_text().splitlines()
    data = collections.defaultdict(lambda: ArrayInterval(shape))
    for line in lines:
        if not line.strip():
            continue
        parts = line.split()
        assert parts[0] == 'SPEAKER', parts
        file_id = parts[1]
        begin = decimal.Decimal(parts[3]) * sample_rate
        end = begin + decimal.Decimal(parts[4]) * sample_rate
        name = parts[7]
        assert begin == int(begin), (line, begin)
        assert end == int(end), (line, end)
        data[(file_id, name)][int(begin):int(end)] = 1
    out = {}
    for (file_id, name), ai in data.items():
        out.setdefault(file_id, {})[name] = ai
    return out
