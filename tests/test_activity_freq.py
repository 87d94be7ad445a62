"""Activity sample<->frame conversion: golden values from the reference
doctests (pb_chime5/database/chime5/database.py:337-456)."""

import numpy as np

from pb_chime5_tpu.utils import (
    activity_time_to_frequency, activity_frequency_to_time, segment_axis)
from pb_chime5_tpu.ops import stft


VAD = np.array([0, 0, 0, 0, 0, 1, 1, 0, 1, 0, 0, 0, 0, 0])


def test_time_to_frequency_fading():
    got = activity_time_to_frequency(
        VAD, stft_window_length=4, stft_shift=2, stft_fading=True)
    want = [False, False, True, True, True, True, False, False]
    np.testing.assert_array_equal(got, want)
    got2 = activity_time_to_frequency(
        [VAD, VAD], stft_window_length=4, stft_shift=2, stft_fading=True)
    np.testing.assert_array_equal(got2, [want, want])


def test_time_to_frequency_no_fading():
    got = activity_time_to_frequency(
        VAD, stft_window_length=4, stft_shift=2, stft_fading=False)
    np.testing.assert_array_equal(
        got, [False, True, True, True, True, False])


def test_time_to_frequency_shape_matches_stft():
    # database.py:453-456
    act = activity_time_to_frequency(
        np.zeros(200000), stft_window_length=1024, stft_shift=256,
        stft_fading=False, stft_pad=False)
    assert act.shape == (778,)
    # and with the production config the frame axis matches the stft op
    x = np.zeros(48000, np.float32)
    T = stft(x, 1024, 256, fading=True).shape[-2]
    act = activity_time_to_frequency(
        np.zeros(48000), stft_window_length=1024, stft_shift=256,
        stft_fading=True, stft_pad=True)
    assert act.shape == (T,)


def test_frequency_to_time_golden():
    # database.py:337-353
    vad = np.array([0, 1, 0, 1, 0, 0, 1, 0, 0])
    got = activity_frequency_to_time(
        vad, stft_window_length=4, stft_shift=2, stft_fading=False)
    want = np.array([0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 1, 1, 1, 1,
                     0, 0, 0, 0], bool)
    np.testing.assert_array_equal(got, want)
    got2 = activity_frequency_to_time(
        [vad, vad], stft_window_length=4, stft_shift=2, stft_fading=False)
    np.testing.assert_array_equal(got2, [want, want])


def test_frequency_to_time_length_adjust():
    vad = np.array([1, 1, 0, 0])
    out = activity_frequency_to_time(vad, 400, 160, time_length=800)
    assert out.shape == (800,)
    out = activity_frequency_to_time(vad, 400, 160, time_length=1100)
    assert out.shape == (1100,)


def test_roundtrip_superset():
    """time->freq->time covers at least the original activity."""
    rng = np.random.default_rng(0)
    act = rng.random(5000) < 0.2
    freq = activity_time_to_frequency(act, 1024, 256, stft_fading=False)
    back = activity_frequency_to_time(freq, 1024, 256)[:5000]
    assert np.all(back[act])


def test_segment_axis_modes():
    x = np.arange(10)
    np.testing.assert_array_equal(
        segment_axis(x, 4, 2, end='cut'),
        [[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7], [6, 7, 8, 9]])
    padded = segment_axis(x, 4, 3, end='pad')
    assert padded.shape == (3, 4)
    np.testing.assert_array_equal(padded[-1], [6, 7, 8, 9])
    padded2 = segment_axis(np.arange(11), 4, 3, end='pad')
    np.testing.assert_array_equal(padded2[-1], [9, 10, 0, 0])
