"""ArrayInterval: behaviour pinned by the reference doctests
(pb_chime5/utils/intervall_array.py)."""

import pickle

import numpy as np
import pytest

from pb_chime5_tpu.utils import ArrayInterval, array_intervals_from_rttm
from pb_chime5_tpu.utils.array_interval import (
    array_interval_from_str, HAVE_NATIVE,
    _py_intersection, _py_non_intersection, _py_normalize,
    _py_str_to_intervals,
)


@pytest.mark.skipif(not HAVE_NATIVE, reason='extension not built '
                    '(pure-Python fallback active; run '
                    'python setup.py build_ext --inplace)')
def test_native_matches_python():
    from pb_chime5_tpu.utils import _interval_ops as ops
    ivs = ((0, 5), (7, 9), (3, 8), (20, 30), (30, 30))
    assert ops.normalize(ivs) == _py_normalize(ivs)
    assert ops.intersection((4, 25), ivs) == _py_intersection((4, 25), ivs)
    assert ops.non_intersection((4, 25), ivs) == \
        _py_non_intersection((4, 25), ivs)
    assert ops.str_to_intervals('1:4, 5:20,') == \
        _py_str_to_intervals('1:4, 5:20,')


def test_setitem_getitem_golden():
    # reference doctest intervall_array.py:302-333
    ai = ArrayInterval(50)
    ai[10:15] = 1
    assert repr(ai) == 'ArrayInterval("10:15", shape=(50,))'
    ai[5:10] = 1
    assert repr(ai) == 'ArrayInterval("5:15", shape=(50,))'
    ai[1:4] = 1
    assert repr(ai) == 'ArrayInterval("1:4, 5:15", shape=(50,))'
    ai[15:20] = 1
    assert repr(ai) == 'ArrayInterval("1:4, 5:20", shape=(50,))'
    ai[21:25] = 1
    assert repr(ai) == 'ArrayInterval("1:4, 5:20, 21:25", shape=(50,))'
    ai[10:15] = 1
    assert repr(ai) == 'ArrayInterval("1:4, 5:20, 21:25", shape=(50,))'
    ai[0:50] = 1
    ai[0:0] = 1
    assert repr(ai) == 'ArrayInterval("0:50", shape=(50,))'
    np.testing.assert_array_equal(ai[3:6], [True, True, True])
    ai[3:6] = np.array([True, False, True])
    assert repr(ai) == 'ArrayInterval("0:4, 5:50", shape=(50,))'
    ai[10:13] = np.array([False, True, False])
    assert repr(ai) == 'ArrayInterval("0:4, 5:10, 11:12, 13:50", shape=(50,))'


def test_getitem_golden():
    # reference doctest intervall_array.py:434-442
    ai = ArrayInterval(50)
    np.testing.assert_array_equal(ai[19:26], np.zeros(7, bool))
    ai[10:20] = 1
    ai[25:30] = 1
    assert repr(ai) == 'ArrayInterval("10:20, 25:30", shape=(50,))'
    np.testing.assert_array_equal(
        ai[19:26], [True, False, False, False, False, False, True])


def test_from_array_golden():
    # reference doctest intervall_array.py:109-122
    ai = ArrayInterval.from_array(
        np.array([1, 1, 0, 1, 0, 0, 1, 1, 0], bool))
    assert repr(ai) == 'ArrayInterval("0:2, 3:4, 6:8", shape=(9,))'
    for pattern in ([1, 1, 1, 1], [0, 0, 0, 0], [0, 1, 1, 0], [1, 0, 0, 1]):
        a = np.array(pattern, bool)
        np.testing.assert_array_equal(ArrayInterval.from_array(a)[:], a)


def test_from_str_and_pickle():
    ai = array_interval_from_str('1:4, 5:20, 21:25', shape=50)
    assert repr(ai) == 'ArrayInterval("1:4, 5:20, 21:25", shape=(50,))'
    ai2 = pickle.loads(pickle.dumps(ai))
    assert ai == ai2
    # single interval, trailing comma (intervall_array.py:14-21)
    assert repr(array_interval_from_str('1:4,', shape=50)) == \
        'ArrayInterval("1:4", shape=(50,))'


def test_normalize_golden():
    assert _py_normalize([]) == ()
    assert _py_normalize([(0, 1)]) == ((0, 1),)
    assert _py_normalize([(0, 1), (2, 3)]) == ((0, 1), (2, 3))
    assert _py_normalize([(0, 1), (20, 30)]) == ((0, 1), (20, 30))
    assert _py_normalize([(0, 1), (1, 3)]) == ((0, 3),)
    assert _py_normalize([(0, 1), (1, 3), (3, 10)]) == ((0, 10),)


def test_shape_none_unbounded():
    ai = ArrayInterval(None)
    ai[100:200] = 1
    np.testing.assert_array_equal(ai[150:160], np.ones(10, bool))


def test_zero_assignment():
    ai = ArrayInterval(30)
    ai[0:30] = 1
    ai[10:20] = 0
    assert repr(ai) == 'ArrayInterval("0:10, 20:30", shape=(30,))'


def test_boundary_clear_regression():
    """Clearing a range that shares a boundary with an existing interval
    must actually clear it (the reference's strict-inequality
    non-intersection silently kept it)."""
    ai = ArrayInterval(100)
    ai[0:100] = 1
    ai[0:50] = 0
    assert repr(ai) == 'ArrayInterval("50:100", shape=(100,))'
    ai2 = ArrayInterval(100)
    ai2[0:100] = 1
    ai2[50:100] = 0
    assert repr(ai2) == 'ArrayInterval("0:50", shape=(100,))'
    # array assignment at an exact boundary
    ai3 = ArrayInterval(50)
    ai3[0:50] = 1
    ai3[0:3] = np.array([False, True, False])
    np.testing.assert_array_equal(ai3[0:4], [False, True, False, True])


def test_sum():
    ai = ArrayInterval(100)
    ai[10:20] = 1
    ai[50:55] = 1
    assert ai.sum() == 15


def test_step_slice_rejected():
    ai = ArrayInterval(10)
    with pytest.raises(AssertionError):
        ai[0:10:2] = 1


def test_from_rttm(tmp_path):
    # reference doctest intervall_array.py:45-58
    f = tmp_path / 'dummy.rttm'
    f.write_text('SPEAKER S02 1 0 1 <NA> <NA> 1 <NA>\n'
                 'SPEAKER S02 1 2 1 <NA> <NA> 1 <NA>\n'
                 'SPEAKER S02 1 0 2 <NA> <NA> 2 <NA>')
    out = array_intervals_from_rttm(f)
    assert set(out) == {'S02'}
    assert repr(out['S02']['1']) == \
        'ArrayInterval("0:16000, 32000:48000", shape=None)'
    assert repr(out['S02']['2']) == 'ArrayInterval("0:32000", shape=None)'
