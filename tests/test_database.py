"""Database layer on a synthetic CHiME-5-format corpus."""

import numpy as np
import pytest

from pb_chime5_tpu import mapping
from pb_chime5_tpu.activity import get_activity
from pb_chime5_tpu.database import DictDatabase, keys as K
from pb_chime5_tpu.database.chime5 import (
    Chime5, AddContext, backup_orig_start_end, adjust_start_end,
    _adjust_start_end, nest_broadcast, nest_map_structure,
    kaldi_to_nt_example_id, kaldi_id_to_channel)
from pb_chime5_tpu.database.create_json import (
    create_database, check_audio_files_exist, to_samples)
from pb_chime5_tpu.database.lazy import LazyDataset, from_dict, concatenate
from pb_chime5_tpu.io import dump_json
from pb_chime5_tpu.testing import create_synthetic_chime5


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp('chime5')
    info = create_synthetic_chime5(root, session_ids=('S02',),
                                   duration_seconds=20.0,
                                   utterances_per_speaker=2, seed=3)
    db_dict = create_database(root)
    check_audio_files_exist(db_dict)
    json_path = root / 'chime5.json'
    dump_json(db_dict, json_path)
    return info, db_dict, json_path


# ------------------------------------------------------------------ lazy --

def test_lazy_dataset_basics():
    ds = from_dict({'a': {'x': 1}, 'b': {'x': 2}, 'c': {'x': 3}})
    assert len(ds) == 3
    assert ds['b'] == {'x': 2}
    assert ds[1] == {'x': 2}
    assert [e['x'] for e in ds] == [1, 2, 3]
    mapped = ds.map(lambda e: {**e, 'y': e['x'] * 10})
    assert mapped['a']['y'] == 10
    # laziness: map does not mutate the stored examples
    assert ds['a'] == {'x': 1}
    filtered = mapped.filter(lambda e: e['x'] > 1, lazy=False)
    assert len(filtered) == 2
    sliced = mapped[slice(0, 2)]
    assert len(sliced) == 2 and sliced[0]['y'] == 10
    groups = mapped.groupby(lambda e: e['x'] % 2)
    assert sorted(groups) == [0, 1]
    cat = concatenate(from_dict({'a': {}}), from_dict({'b': {}}))
    assert len(cat) == 2


def test_lazy_dataset_sort():
    ds = from_dict({'a': {'x': 3}, 'b': {'x': 1}, 'c': {'x': 2}})
    out = [e['x'] for e in ds.sort(lambda e: e['x'])]
    assert out == [1, 2, 3]


def test_lazy_dataset_deepcopy_isolation():
    ds = from_dict({'a': {'v': [1, 2]}})
    e1 = ds['a']
    e1['v'].append(3)
    assert ds['a'] == {'v': [1, 2]}


# -------------------------------------------------------------- to_samples

def test_to_samples_golden():
    # reference doctest get_speaker_activity.py:82-110
    assert to_samples('0:47:52.708375') == 45963334
    assert to_samples('0:47:52.7083750') == 45963334
    assert to_samples('0:47:54.1956875') == 45987131
    assert to_samples('1000:47:54.1956875') == 57645987131
    assert to_samples('0:01:04.62') == 1033920


def test_samples_to_time_roundtrip():
    from pb_chime5_tpu.testing import samples_to_time_str
    rng = np.random.default_rng(0)
    for s in rng.integers(0, 3 * 3600 * 16000, 50):
        assert to_samples(samples_to_time_str(int(s))) == int(s)


# --------------------------------------------------------------- builder --

def test_create_database_structure(corpus):
    info, db_dict, _ = corpus
    assert set(db_dict[K.ALIAS]) == {'dev'}
    assert db_dict[K.ALIAS]['dev'] == ['S02']
    examples = db_dict[K.DATASETS]['S02']
    n_expected = len(info['sessions']['S02']['utterances'])
    assert len(examples) == n_expected
    ex = next(iter(examples.values()))
    assert set(ex[K.START]) == {'observation', 'worn', 'original'}
    assert sorted(ex[K.AUDIO_PATH]['observation']) == \
        info['sessions']['S02']['arrays']
    assert len(ex[K.AUDIO_PATH]['observation']['U01']) == 4
    assert ex['reference_array'] == 'U01'
    assert ex['location'] == 'kitchen'
    # array clock = original + drift (+- jitter <= 3)
    drift = info['sessions']['S02']['drifts']['U01']
    delta = ex[K.START]['observation']['U01'] - ex[K.START]['original']
    assert abs(delta - drift) <= 3


# ----------------------------------------------------------- adjust_times

def test_adjust_start_end_properties():
    # behaviour pinned by the reference's randomized doctest
    # (database.py:483-506)
    rng = np.random.default_rng(0)
    w_s = int(rng.integers(0, 100))
    w_e = w_s + int(rng.integers(1, 100))
    a_s = int(rng.integers(0, 100))
    a_e = a_s + w_e - w_s

    def check(a_s_, a_e_, d_s, d_e):
        got = _adjust_start_end(w_s, w_e, a_s_, a_e_)
        assert got == (a_s_ + d_s, a_e_ + d_e), (got, a_s_, a_e_, d_s, d_e)

    check(a_s, a_e, 0, 0)
    check(a_s, a_e + 1, 0, -1)
    check(a_s, a_e - 1, 0, +1)
    check(a_s + 1, a_e, 0, +1)
    check(a_s - 1, a_e, 0, -1)
    check(a_s, a_e + 2, 1, -1)
    check(a_s, a_e - 2, -1, 1)
    check(a_s, a_e + 3, 1, -2)
    check(a_s, a_e - 3, -1, +2)
    check(a_s, a_e + 4, 2, -2)
    check(a_s, a_e + 5, 2, -3)
    assert _adjust_start_end(10, 20, 10, 19) == (10, 20)
    assert _adjust_start_end(10, 20, 10, 21) == (10, 20)


def test_iterator_adjust_times_equalizes_durations(corpus):
    _, _, json_path = corpus
    db = Chime5(json_path)
    it = db.get_iterator_for_session(
        'S02', adjust_times=True, drop_unknown_target_speaker=True)
    for ex in it:
        worn_duration = ex[K.END]['original'] - ex[K.START]['original']
        for arr, s in ex[K.START]['observation'].items():
            e = ex[K.END]['observation'][arr]
            assert e - s == worn_duration
            assert ex[K.NUM_SAMPLES]['observation'][arr] == worn_duration


# -------------------------------------------------------------- AddContext

def test_add_context_int(corpus):
    _, _, json_path = corpus
    db = Chime5(json_path)
    base = db.get_iterator_for_session('S02')[0]
    it = db.get_iterator_for_session('S02', context_samples=100)
    ex = it[0]
    assert ex[K.START]['original'] == base[K.START]['original'] - 100
    assert ex[K.END]['original'] == base[K.END]['original'] + 100
    assert ex[K.NUM_SAMPLES]['original'] == \
        base[K.NUM_SAMPLES]['original'] + 200
    # originals preserved
    assert ex['start_orig']['original'] == base[K.START]['original']
    assert ex['num_samples_orig']['original'] == \
        base[K.NUM_SAMPLES]['original']


def test_add_context_clips_at_zero():
    ex = {
        K.START: {'observation': {'U01': 50}, 'original': 40},
        K.END: {'observation': {'U01': 150}, 'original': 140},
        K.NUM_SAMPLES: {'observation': {'U01': 100}, 'original': 100},
    }
    ex = backup_orig_start_end(ex)
    ex = AddContext(10 ** 10)(ex)
    assert ex[K.START]['observation']['U01'] == 0
    assert ex[K.START]['original'] == 0
    assert ex[K.END]['original'] == 140 + 10 ** 10


def test_add_context_equal_start_context():
    # reference doctest database.py:831-860: with a huge context and
    # equal_start_context, every track keeps the SAME achieved start
    # context = min over tracks (clipping at 0)
    ex = {
        K.START: {'observation': {'U01': 480, 'U05': 0},
                  'original': 0,
                  'worn': {'P05': 0}},
        K.END: {'observation': {'U01': 1480, 'U05': 1000},
                'original': 1000, 'worn': {'P05': 1000}},
        K.NUM_SAMPLES: {'observation': {'U01': 1000, 'U05': 1000},
                        'original': 1000, 'worn': {'P05': 1000}},
    }
    ex = backup_orig_start_end(ex)
    ex = AddContext(10 ** 10, equal_start_context=True)(ex)
    # smallest achieved start context is 0 (tracks starting at 0)
    assert ex[K.START]['observation']['U01'] == 480
    assert ex[K.START]['observation']['U05'] == 0
    assert ex[K.START]['original'] == 0


def test_add_context_pair_and_dict():
    ex = {
        K.START: {'observation': {'U01': 1000}, 'original': 1000},
        K.END: {'observation': {'U01': 2000}, 'original': 2000},
        K.NUM_SAMPLES: {'observation': {'U01': 1000}, 'original': 1000},
    }
    ex2 = AddContext([100, 50])(backup_orig_start_end(dict(ex)))
    assert ex2[K.START]['observation']['U01'] == 900
    assert ex2[K.END]['observation']['U01'] == 2050
    assert ex2[K.NUM_SAMPLES]['original'] == 1150

    ex3 = AddContext({'observation': [100, 50], 'original': 0})(
        backup_orig_start_end(dict(ex)))
    assert ex3[K.START]['observation']['U01'] == 900
    assert ex3[K.START]['original'] == 1000
    assert ex3[K.END]['original'] == 2000


def test_add_context_negative_rejected():
    with pytest.raises(AssertionError, match='Negative context'):
        AddContext(-50)
    with pytest.raises(AssertionError, match='Negative context'):
        AddContext([100, -50])


def test_nest_broadcast_golden():
    # reference doctest database.py:577-599
    shallow = {'a': [1, 2, (3, 4)], 'b': [5, (6,)]}
    assert nest_broadcast(shallow, 10) == \
        {'a': [10, 10, (10, 10)], 'b': [10, (10,)]}
    assert nest_broadcast(shallow, {'a': 11, 'b': 12}) == \
        {'a': [11, 11, (11, 11)], 'b': [12, (12,)]}
    assert nest_broadcast(shallow, {'a': 11, 'b': [13, 14]}) == \
        {'a': [11, 11, (11, 11)], 'b': [13, (14,)]}
    with pytest.raises(AssertionError):
        nest_broadcast(shallow, {'a': 11})
    with pytest.raises(TypeError):
        nest_broadcast(shallow, (1, 2))
    assert nest_broadcast(shallow, (1, 2), sequence_type=None) == \
        {'a': (1, 2), 'b': (1, 2)}


# ----------------------------------------------------------------- reader

def test_audio_reader(corpus):
    _, _, json_path = corpus
    db = Chime5(json_path)
    it = db.get_iterator_for_session('S02', audio_read=True)
    ex = it[0]
    arr0 = ex['session_id']
    data = ex[K.AUDIO_DATA]
    u01 = data['observation']['U01']
    assert u01.shape == (4, ex[K.NUM_SAMPLES]['observation']['U01'])
    worn = data['worn'][ex[K.SPEAKER_ID]]
    assert worn.shape == (2, ex[K.NUM_SAMPLES]['original'])


# ----------------------------------------------------------------- ids ---

def test_kaldi_id_conversions():
    assert kaldi_to_nt_example_id('P28_S09_LIVING.R-0714562-0714764') == \
        'P28_S09_0714562-0714764'
    with pytest.raises(NotImplementedError):
        kaldi_to_nt_example_id('P05_S02_U02_KITCHEN.ENH-0007012-0007298')
    assert kaldi_id_to_channel('P28_S09_LIVING.R-0714562-0714764') == 'R'
    assert kaldi_id_to_channel('P09_S03_U01_NOLOCATION.CH1-0005948-0006038')\
        == 'CH1'


def test_example_id_map_fn():
    ex = {K.EXAMPLE_ID: 'P05_S02_0004060-0004382', K.DATASET_NAME: 'dev',
          K.LOCATION: 'kitchen'}
    assert Chime5.example_id_map_fn(ex) == \
        'P05_S02_KITCHEN.L-0004060-0004382'
    ex = {K.EXAMPLE_ID: 'P09_S03_0005948-0006038', K.DATASET_NAME: 'train',
          K.LOCATION: 'unknown'}
    assert Chime5.example_id_map_fn(ex) == \
        'P09_S03_NOLOCATION.L-0005948-0006038'


# -------------------------------------------------------------- activity -

def test_get_activity_array_perspective(corpus):
    info, _, json_path = corpus
    db = Chime5(json_path)
    it = db.get_iterator_for_session('S02')
    activity = get_activity(
        iterator=it, perspective='array', garbage_class=True,
        use_ArrayIntervall=True)
    session = info['sessions']['S02']
    assert set(activity) == {'S02'}
    # the mapping lists all six arrays for S02; the fixture only has two,
    # but activity tracks exist for every mapped array
    assert set(activity['S02']) == set(mapping.session_to_arrays['S02'])
    tracks = activity['S02']['U01']
    assert set(tracks) == set(session['speakers']) | {'Noise'}
    # Noise always on
    assert tracks['Noise'][0:100].all()
    # speaker activity covers each utterance (on the drifted array clock)
    drift = session['drifts']['U01']
    for utt in session['utterances']:
        s = utt['start'] + drift
        e = utt['end'] + drift
        seg = tracks[utt['speaker']][s + 5:e - 5]
        assert seg.all(), (utt, seg.mean())


def test_get_activity_garbage_variants(corpus):
    _, _, json_path = corpus
    db = Chime5(json_path)
    it = db.get_iterator_for_session('S02')
    act_none = get_activity(iterator=it, perspective='worn',
                            garbage_class=None)
    assert 'Noise' not in act_none['S02']['P05']
    act_false = get_activity(iterator=it, perspective='worn',
                             garbage_class=False)
    assert not act_false['S02']['P05']['Noise'][0:1000].any()
    act_two = get_activity(iterator=it, perspective='global_worn',
                           garbage_class=2)
    assert {'Noise0', 'Noise1'} <= set(act_two['S02']['P'])


def test_activity_worn_vs_global_worn(corpus):
    _, _, json_path = corpus
    db = Chime5(json_path)
    it = db.get_iterator_for_session('S02')
    act = get_activity(iterator=it, perspective='worn', garbage_class=None)
    assert set(act['S02']) == set(mapping.session_to_speakers['S02'])
    act_g = get_activity(iterator=it, perspective='global_worn',
                         garbage_class=None)
    assert set(act_g['S02']) == {'P'}
