"""morph DSL, numpy utils, host stable_solve, kaldi parsers, iterator
transforms, alignment merge, cross-talk builder, visualization."""

import numpy as np
import pytest

from pb_chime5_tpu.utils.numpy_utils import (
    morph, pad_axis, roll_zeropad, labels_to_one_hot, Cutter)
from pb_chime5_tpu.math import stable_solve


# ------------------------------------------------------------------ morph

def test_morph_merge_split():
    x = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)
    merged = morph('ACTF->A*CTF', x)
    assert merged.shape == (6, 4, 5)
    np.testing.assert_array_equal(merged, x.reshape(6, 4, 5))
    back = morph('A*CTF->ACTF', merged, A=2)
    np.testing.assert_array_equal(back, x)


def test_morph_transpose_reduce():
    x = np.random.default_rng(0).random((3, 4, 5))
    # 'DTF->FT' with median over D (beamforming_wrapper.py:30)
    got = morph('DTF->FT', x, reduce=np.median)
    np.testing.assert_allclose(got, np.median(x, axis=0).T)
    # plain transpose
    np.testing.assert_array_equal(morph('TF->FT', x[0]), x[0].T)


def test_morph_singleton():
    x = np.random.default_rng(0).random((1, 3, 4, 5))
    got = morph('1DTF->FDT', x)
    np.testing.assert_array_equal(got, x[0].transpose(2, 0, 1))
    got2 = morph('1DTF->FT', x, reduce=np.median)
    np.testing.assert_allclose(got2, np.median(x[0], 0).T)


def test_morph_requires_reduce():
    with pytest.raises(AssertionError, match='reduce'):
        morph('DT->T', np.zeros((2, 3)))


# ------------------------------------------------------- numpy utilities

def test_pad_axis():
    x = np.ones((2, 3))
    assert pad_axis(x, (1, 2), axis=-1).shape == (2, 6)
    assert pad_axis(x, 1, axis=0).shape == (4, 3)


def test_roll_zeropad():
    x = np.array([1, 2, 3, 4])
    np.testing.assert_array_equal(roll_zeropad(x, 2, axis=0), [0, 0, 1, 2])
    np.testing.assert_array_equal(roll_zeropad(x, -1, axis=0),
                                  [2, 3, 4, 0])
    np.testing.assert_array_equal(roll_zeropad(x, 0, axis=0), x)


def test_labels_to_one_hot():
    oh = labels_to_one_hot(np.array([0, 2, 1]), 3, axis=0)
    assert oh.shape == (3, 3)
    np.testing.assert_array_equal(oh[:, 0], [1, 0, 0])
    np.testing.assert_array_equal(oh[:, 1], [0, 0, 1])


def test_cutter():
    mask = np.ones((4, 10))
    cut = Cutter(low_cut=2, high_cut=8)(mask)
    assert cut[:, :2].sum() == 0 and cut[:, 8:].sum() == 0
    assert cut[:, 2:8].sum() == 24
    over = Cutter(low_cut=2, high_cut=8).overwrite(mask, 0.5)
    np.testing.assert_allclose(over[:, 0], 0.5)
    np.testing.assert_allclose(over[:, 5], 1.0)


def test_stable_solve_fallback(rng):
    A = rng.standard_normal((4, 3, 3))
    A[1] = 0.0  # singular
    B = rng.standard_normal((4, 3, 2))
    X = stable_solve(A, B)
    assert X.shape == (4, 3, 2)
    np.testing.assert_allclose(A[0] @ X[0], B[0], atol=1e-10)
    np.testing.assert_allclose(
        X[1], np.linalg.lstsq(A[1], B[1], rcond=None)[0])


# -------------------------------------------------------- kaldi parsers

def test_parse_wer_lines():
    from pb_chime5_tpu.kaldi.decode import _parse_wer_lines
    line = '%WER 60.89 [ 35000 / 58881, 2518 ins, 22449 del, 10033 sub ]'
    wer, errors, words, ins, del_, sub = _parse_wer_lines([line])
    assert (wer, errors, words, ins, del_, sub) == \
        (60.89, 35000, 58881, 2518, 22449, 10033)
    assert np.isnan(_parse_wer_lines(['no wer here'])[0])


def test_parse_kaldi_wer_file(tmp_path):
    from pb_chime5_tpu.kaldi.io import parse_kaldi_wer_file
    f = tmp_path / 'wer_15'
    f.write_text(
        'compute-wer --text --mode=present ark:test ark,p:-\n'
        '%WER 45.11 [ 1830 / 4057, 36 ins, 638 del, 1156 sub ]\n'
        '%SER 97.57 [ 241 / 247 ]\n'
        'Scored 247 sentences, 0 not present in hyp.\n')
    got = parse_kaldi_wer_file(f)
    assert got['wer'] == 45.11
    assert got['word_errors'] == 1830
    assert got['ser'] == 97.57
    assert got['missing'] == 0


def test_parse_best_wer_text():
    from pb_chime5_tpu.kaldi.io import _parse_kaldi_best_wer_text
    text = ('%WER 72.78 [ 42853 / 58881, 2518 ins, 22449 del, 17886 sub ] '
            '/some/decode/dir/wer_8_0.5')
    got = _parse_kaldi_best_wer_text(text)
    assert got['wer'] == 72.78 and got['file'] == '/some/decode/dir/wer_8_0.5'


def test_keyed_text_file(tmp_path):
    from pb_chime5_tpu.kaldi.io import (
        read_keyed_text_file, write_keyed_text_file, word2id, id2word)
    f = tmp_path / 'text'
    write_keyed_text_file(f, {'utt2': ['b', 'c'], 'utt1': 'a'})
    assert f.read_text() == 'utt1 a\nutt2 b c'
    assert read_keyed_text_file(f) == {'utt1': ['a'], 'utt2': ['b', 'c']}
    with pytest.raises(ValueError):
        write_keyed_text_file(tmp_path / 'utt2dur', {'u': 'abc'})
    write_keyed_text_file(tmp_path / 'spk2gender', {'s': 'female'})
    assert (tmp_path / 'spk2gender').read_text() == 's f'
    w = tmp_path / 'words.txt'
    w.write_text('<eps> 0\nhello 1\nworld 2')
    assert word2id(w)['hello'] == 1
    assert id2word(w)[2] == 'world'


def test_fst_linear_acceptor():
    from pb_chime5_tpu.kaldi.fst import linear_acceptor_text
    assert linear_acceptor_text([3, 7]) == '0 1 3 3\n1 2 7 7\n2'


# ------------------------------------------------------ alignment merge

def test_alignment_helper_golden():
    # reference doctests utils/alignment.py:154-191
    from pb_chime5_tpu.utils.alignment import _helper
    alignments = {
        'P28_S09_LIVING.R-0714562-0714764': [1],
        'P28_S09_LIVING.L-0714562-0714764': [2],
        'P09_S03_NOLOCATION.L-0007974-0008116': [3],
        'P09_S03_NOLOCATION.R-0008255-0008300': [4],
    }
    assert _helper(alignments, channel_preference=['R', 'L']) == {
        'P09_S03_0007974-0008116': [3],
        'P09_S03_0008255-0008300': [4],
        'P28_S09_0714562-0714764': [1],
    }
    assert _helper(alignments, channel_preference=['L', 'R']) == {
        'P09_S03_0007974-0008116': [3],
        'P09_S03_0008255-0008300': [4],
        'P28_S09_0714562-0714764': [2],
    }
    assert _helper(alignments, channel_preference=['L', 'R'],
                   use_kaldi_id=True) == {
        'P09_S03_NOLOCATION.L-0007974-0008116': [3],
        'P09_S03_NOLOCATION.R-0008255-0008300': [4],
        'P28_S09_LIVING.L-0714562-0714764': [2],
    }
    with pytest.raises(AssertionError, match='Expect channels'):
        _helper(alignments, channel_preference=['L'])
    with pytest.raises(AssertionError):
        _helper(alignments, channel_preference=None, use_kaldi_id=True)
    assert _helper(alignments, channel_preference=None, use_kaldi_id=True,
                   unique_per_utt=False) == {
        'P09_S03_NOLOCATION.L-0007974-0008116': [3],
        'P09_S03_NOLOCATION.R-0008255-0008300': [4],
        'P28_S09_LIVING.L-0714562-0714764': [2],
        'P28_S09_LIVING.R-0714562-0714764': [1],
    }


def test_alignment_id2phone():
    from pb_chime5_tpu.utils.alignment import alignment_id2phone
    out = alignment_id2phone(
        {'utt1': np.array([1, 1, 2], np.int32)}, {1: 'sil', 2: 'ae_B'})
    np.testing.assert_array_equal(out['utt1'], ['sil', 'sil', 'ae_B'])


# ------------------------------------------------- iterator transforms

def test_iterator_transforms():
    from pb_chime5_tpu.database.iterator import (
        IdFilter, Word2Id, remove_zero_length_example)
    assert IdFilter(['a'])({'example_id': 'a'})
    assert not IdFilter(['a'])({'example_id': 'b'})
    ex = {'example_id': 'x', 'transcription': 'hello world'}
    out = Word2Id(lambda w: {'hello': 1, 'world': 2}[w])(ex)
    np.testing.assert_array_equal(out['transcription_ids'], [1, 2])
    assert remove_zero_length_example({'example_id': 'y', 'num_samples': 5})
    assert not remove_zero_length_example(
        {'example_id': 'y', 'num_samples': 0})


def test_limit_audio_length():
    from pb_chime5_tpu.database.iterator import LimitAudioLength
    ex = {
        'example_id': 'z',
        'num_samples': 1000,
        'audio_data': {'observation': np.ones((2, 1000))},
    }
    out = LimitAudioLength(max_lengths=400)(ex)
    assert out['num_samples'] == 400
    assert out['audio_data']['observation'].shape == (2, 400)


# ------------------------------------------------- cross-talk builder

def test_cross_talk_builder(tmp_path):
    from pb_chime5_tpu.testing import create_synthetic_chime5
    from pb_chime5_tpu.database.get_speaker_activity import (
        create_cross_talk_database, get_active_speaker)
    from pb_chime5_tpu.io import load_json
    create_synthetic_chime5(tmp_path / 'c', session_ids=('S02',),
                            duration_seconds=12.0,
                            utterances_per_speaker=2, seed=1)
    create_cross_talk_database(tmp_path / 'c', tmp_path / 'act',
                               datasets=('dev',))
    data = load_json(tmp_path / 'act' / 'S02.json')
    assert 'cross_talk' in data
    assert set(data) == {'P05', 'P06', 'P07', 'P08', 'cross_talk'}
    assert len(data['P05']['P05']['start']) == 2
    out = get_active_speaker(0, 16000, 'S02', 'P05',
                             json_path=tmp_path / 'act')
    assert set(out) == {'P05', 'P06', 'P07', 'P08'}
    assert out['P05']['activity'].shape == (16000,)


# ------------------------------------------------------ visualization

def test_overlap_statistics():
    from pb_chime5_tpu.visualization import overlap_statistics
    act = {
        'P01': np.r_[np.ones(32000, bool), np.zeros(32000, bool)],
        'P02': np.r_[np.zeros(16000, bool), np.ones(32000, bool),
                     np.zeros(16000, bool)],
    }
    stats = overlap_statistics(act)
    assert stats['chunks'] == 4
    assert stats['overlap'] == 0.25
    assert stats['silence'] == 0.25


def test_plot_activity(tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    from pb_chime5_tpu.visualization import plot_activity
    from pb_chime5_tpu.utils import ArrayInterval
    ai = ArrayInterval(64000)
    ai[16000:32000] = 1
    ax = plot_activity({'P01': ai})
    assert ax is not None


def test_stack_context_window_major():
    """stack_context concatenates context frames window-major with
    symmetric edge padding (reference numpy_utils.py:374-396)."""
    from pb_chime5_tpu.utils.numpy_utils import (
        stack_context, unstack_context, tbf_to_tbchw)
    T, B, F = 4, 2, 3
    X = np.arange(T * B * F, dtype=float).reshape(T, B, F)
    S = stack_context(X, left_context=1, right_context=1)
    assert S.shape == (T, B, 3 * F)
    # interior frame: [X[t-1], X[t], X[t+1]]
    np.testing.assert_array_equal(
        S[2, 0], np.concatenate([X[1, 0], X[2, 0], X[3, 0]]))
    # symmetric pad at the head: X[-1] mirrors X[0]
    np.testing.assert_array_equal(
        S[0, 1], np.concatenate([X[0, 1], X[0, 1], X[1, 1]]))
    # center unstack inverts
    np.testing.assert_array_equal(
        unstack_context(S, 'center', left_context=1, right_context=1), X)
    with np.testing.assert_raises(NotImplementedError):
        unstack_context(S, 'overlap', left_context=1, right_context=1)

    # tbchw layout: (T', B, 1, F, W), step_width strides the windows
    Y = tbf_to_tbchw(X, 1, 1, step_width=2)
    assert Y.shape == (2, B, 1, F, 3)
    np.testing.assert_array_equal(Y[1, 0, 0, :, 1], X[2, 0])


def test_split_merge_complex_features():
    from pb_chime5_tpu.utils.numpy_utils import (
        split_complex_features, merge_complex_features)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((3, 2, 5)) + 1j * rng.standard_normal((3, 2, 5))
    S = split_complex_features(X)
    assert S.shape == (3, 2, 10) and S.dtype.kind == 'f'
    np.testing.assert_array_equal(merge_complex_features(S), X)


def test_add_context_dispatch():
    from pb_chime5_tpu.utils.numpy_utils import (
        add_context, stack_context, tbf_to_tbchw)
    T, B, F = 5, 2, 6
    X = np.arange(T * B * F, dtype=float).reshape(T, B, F)
    np.testing.assert_array_equal(
        add_context(X, 1, 1), stack_context(X, 1, 1))
    # non-sequence output flattens the batch axis, batch-major
    flat = add_context(X, 1, 1, sequence_output=False)
    assert flat.shape == (T * B, 3 * F)
    np.testing.assert_array_equal(flat[:T], stack_context(X, 1, 1)[:, 0])
    # cnn layout with zero padding (not symmetric)
    cnn = add_context(X, 1, 1, cnn_features=True)
    assert cnn.shape == (T, B, 1, F, 3)
    assert np.all(cnn[0, :, 0, :, 0] == 0)          # zero-padded head
    # deltas split into channels: F = 6 = (1 + 2 deltas) x 2 feats
    d = add_context(X, 1, 1, cnn_features=True, deltas_as_channel=True,
                    num_deltas=2)
    assert d.shape == (T, B, 3, 2, 3)


def test_gss_flop_model_reproduces_ledger_bounds():
    """The analytic FLOP model (utils/flops.py, VERDICT r4 #3) must
    reproduce the two measured WPE-statistics FLOP bounds in the
    ARCHITECTURE ledger from its own constants:

    * full complex-einsum Gram (the 'xla' backend): 8*(taps*D)^2*T*F
      real FLOPs/iter = 592 GFLOP at the headline config -> 18.0 ms at
      the 32.8 TFLOP/s f32 6-pass peak (ledger: "~18 ms/iter");
    * real-form Hermitian-blocked Grams (the shipping backend): the
      model's wpe_stats counts the lower-triangular strips + P fold ->
      ~13 ms/iter at the same peak (ledger round-4 entry).

    Also pins the invariants the bench MFU depends on: stage shares and
    the total at the headline config.
    """
    from pb_chime5_tpu.utils.flops import (
        gss_stage_flops, gss_total_flops, V5E_PEAK_TFLOPS_F32_6PASS)
    from pb_chime5_tpu.ops.stft import stft_frame_count

    kw = dict(num_samples=640000, D=24, K=5)
    fs = gss_stage_flops(**kw)
    assert gss_total_flops(**kw) == sum(fs.values())

    T = stft_frame_count(640000, 1024, 256, fading=True)
    F = 513
    peak = V5E_PEAK_TFLOPS_F32_6PASS * 1e12

    # ledger bound 1: full complex Gram ~18 ms/iter
    full_gram = 8 * (10 * 24) ** 2 * T * F
    assert abs(full_gram / peak * 1e3 - 18.0) < 0.5

    # ledger bound 2: real-form blocked stats ~13 ms/iter (the model's
    # per-iteration wpe_stats), and it must be cheaper than the full
    # Gram (that is the point of the blocked formulation)
    per_iter = fs['wpe_stats'] / 3
    assert 12.0 < per_iter / peak * 1e3 < 14.0
    assert per_iter < full_gram

    # headline total ~3.0 TFLOP; wpe_stats and EM are the two dominant
    # stages (~43% each)
    tot = sum(fs.values())
    assert 2.8e12 < tot < 3.2e12
    assert 0.38 < fs['wpe_stats'] / tot < 0.48
    assert 0.38 < fs['em'] / tot < 0.48
