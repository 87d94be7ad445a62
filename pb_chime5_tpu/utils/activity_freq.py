"""Sample-level activity <-> STFT-frame-level activity (host-side NumPy).

Reproduces the behaviour of the reference's
``activity_time_to_frequency`` / ``activity_frequency_to_time``
(pb_chime5/database/chime5/database.py:409-472 and :328-405): a frame is
active iff *any* sample under its analysis window is active; the inverse
marks every sample under an active frame.  Golden values from the
reference doctests are pinned in tests/test_activity_freq.py.
"""

import numpy as np

__all__ = ['segment_axis', 'activity_time_to_frequency',
           'activity_frequency_to_time']


def segment_axis(x, length: int, shift: int, *, end='pad', pad_value=0):
    """Frame ``x`` along the last axis into overlapping segments
    ``(..., T, length)``.

    Minimal host-side counterpart of the reference's ``segment_axis_v2``
    (pb_chime5/utils/numpy_utils.py:10-222) covering the modes the pipeline
    uses: ``end='pad'`` (zero-pad the tail up to a full segment), ``'cut'``
    (drop the partial tail), ``None`` (require exact fit).
    """
    x = np.asarray(x)
    n = x.shape[-1]
    if end == 'pad':
        frames = max(1, -(-(n - length + shift) // shift))
        full = (frames - 1) * shift + length
        if full > n:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, full - n)]
            x = np.pad(x, pad, constant_values=pad_value)
    elif end == 'cut':
        frames = (n - length + shift) // shift
        if frames < 1:
            raise ValueError(f'signal too short: {n} < {length} (cut)')
        x = x[..., :(frames - 1) * shift + length]
    elif end is None:
        frames = (n - length) // shift + 1
        assert (frames - 1) * shift + length == n, (n, length, shift)
    else:
        raise ValueError(end)
    strides = x.strides[:-1] + (shift * x.strides[-1], x.strides[-1])
    return np.lib.stride_tricks.as_strided(
        x, shape=x.shape[:-1] + (frames, length), strides=strides,
        writeable=False)


def activity_time_to_frequency(
        time_activity,
        stft_window_length: int,
        stft_shift: int,
        stft_fading: bool,
        stft_pad: bool = True,
):
    """(..., N) sample activity -> (..., T) frame activity via any-pooling."""
    time_activity = np.asarray(time_activity)
    assert time_activity.dtype != object, time_activity.dtype
    if stft_fading:
        pad = [(0, 0)] * (time_activity.ndim - 1) + [
            (stft_window_length - stft_shift,) * 2]
        time_activity = np.pad(time_activity, pad)
    return segment_axis(
        time_activity, stft_window_length, stft_shift,
        end='pad' if stft_pad else 'cut',
    ).any(axis=-1)


def activity_frequency_to_time(
        frequency_activity,
        stft_window_length: int,
        stft_shift: int,
        stft_fading: bool = False,
        time_length: int = None,
):
    """(..., T) frame activity -> (..., N) sample activity (union of
    windows)."""
    if stft_fading:
        raise NotImplementedError(stft_fading)
    frequency_activity = np.asarray(frequency_activity)
    T = frequency_activity.shape[-1]
    n = T * stft_shift + stft_window_length - stft_shift
    time_activity = np.zeros((*frequency_activity.shape[:-1], n), bool)
    # overlap-"or": every sample under an active frame becomes active
    view = np.lib.stride_tricks.as_strided(
        time_activity,
        shape=(*time_activity.shape[:-1], T, stft_window_length),
        strides=time_activity.strides[:-1] + (
            stft_shift * time_activity.strides[-1],
            time_activity.strides[-1]),
        writeable=True,
    )
    view[frequency_activity.astype(bool)] = True

    if time_length is not None:
        if time_length < n:
            delta = n - time_length
            assert delta < stft_window_length - stft_shift, \
                (delta, stft_window_length, stft_shift)
            time_activity = time_activity[..., :time_length]
        elif time_length > n:
            delta = time_length - n
            assert delta < stft_window_length - stft_shift, \
                (delta, stft_window_length, stft_shift)
            time_activity = np.pad(
                time_activity,
                [(0, 0)] * (time_activity.ndim - 1) + [(0, delta)])
    return time_activity
