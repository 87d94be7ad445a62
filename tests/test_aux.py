"""Aux subsystems: profiling, resume, fault tolerance, unsupervised
beamformers, Chime6RTTMDatabase, SummaryEncoder."""

import json

import numpy as np
import pytest

from pb_chime5_tpu.utils.profiling import StageTimer, device_sync


def test_stage_timer():
    timer = StageTimer()
    with timer('a'):
        pass
    with timer('a'):
        pass
    with timer('b'):
        pass
    totals = timer.totals()
    assert set(totals) == {'a', 'b'}
    assert 'a' in timer.report()


def test_device_sync():
    import jax.numpy as jnp
    out = device_sync({'x': jnp.ones((3,)), 'y': [jnp.zeros((2, 2))],
                       'z': 'not-an-array'})
    assert out['z'] == 'not-an-array'


def test_change_directory(tmp_path):
    import os
    from pb_chime5_tpu.io import change_directory
    cwd = os.getcwd()
    with change_directory(tmp_path):
        assert os.getcwd() == str(tmp_path)
    assert os.getcwd() == cwd


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp
    from pb_chime5_tpu.utils.profiling import trace
    with trace(tmp_path):
        _ = jnp.ones((8,)) * 2
    # a trace directory should have been produced
    assert any(tmp_path.rglob('*')), list(tmp_path.iterdir())


def test_summary_encoder():
    from pb_chime5_tpu.io import SummaryEncoder
    s = json.dumps({'a': np.zeros((3, 4))}, cls=SummaryEncoder)
    assert 'shape (3, 4)' in s


def test_unsupervised_beamformers(rng):
    import jax.numpy as jnp
    from pb_chime5_tpu.ops.beamform import (
        beamform_mvdr_souden_with_lorenz_mask,
        beamform_mvdr_souden_with_quantile_mask)
    D, T, F = 4, 100, 9
    Y = (rng.standard_normal((D, T, F))
         + 1j * rng.standard_normal((D, T, F))).astype(np.complex64)
    for fn in (beamform_mvdr_souden_with_lorenz_mask,
               beamform_mvdr_souden_with_quantile_mask):
        X = np.asarray(fn(jnp.asarray(Y)))
        assert X.shape == (T, F)
        assert np.isfinite(X).all()


def test_chime6_rttm_database(tmp_path):
    from pb_chime5_tpu.testing import create_synthetic_chime5
    from pb_chime5_tpu.scripts.simulate_chime6_transcriptions import main
    from pb_chime5_tpu.database.rttm import Chime6RTTMDatabase
    create_synthetic_chime5(tmp_path / 'c5', session_ids=('S02',),
                            duration_seconds=8.0,
                            utterances_per_speaker=1, seed=4)
    main(tmp_path / 'c5', tmp_path / 'c6')
    rttm = tmp_path / 'dev.rttm'
    rttm.write_text('SPEAKER S02 1 1.0 0.5 <NA> <NA> P05 <NA>\n')
    db = Chime6RTTMDatabase(rttm, tmp_path / 'c6')
    assert 'dev' in db.database_dict['alias']
    ds = db.get_dataset_for_session('S02')
    ex = ds[0]
    assert ex['start'] == 16000 and ex['end'] == 24000
    assert len(ex['audio_path']) == 8  # 2 arrays x 4 mics
    assert 'P05' in db.worn_files['S02']


def _tiny_enhancer(tmp_path):
    from pb_chime5_tpu.testing import create_synthetic_chime5
    from pb_chime5_tpu.database.create_json import create_database
    from pb_chime5_tpu.io import dump_json
    from pb_chime5_tpu.models.enhancer import get_enhancer
    create_synthetic_chime5(tmp_path / 'c', session_ids=('S02',),
                            duration_seconds=10.0,
                            utterances_per_speaker=1, seed=6)
    json_path = tmp_path / 'chime5.json'
    dump_json(create_database(tmp_path / 'c'), json_path)
    return get_enhancer(
        database_path=str(json_path), wpe=False, bss_iterations=2,
        context_samples=4000, length_buckets=(32000,))


def test_resume_skips_existing(tmp_path):
    enhancer = _tiny_enhancer(tmp_path)
    out = tmp_path / 'audio'
    done = []
    enhancer.enhance_session(['S02'], out, dataset_slice=2,
                             audio_dir_exist_ok=True,
                             progress=done.append)
    assert len(done) == 2
    # second run with resume: nothing re-processed
    done2 = []
    enhancer.enhance_session(['S02'], out, dataset_slice=2,
                             audio_dir_exist_ok=True, resume=True,
                             progress=done2.append)
    assert done2 == []


def test_shard_fn_consumed_lazily(tmp_path, monkeypatch):
    """Regression: enhance_session must NOT materialize shard_fn's
    generator (FileQueueScheduler.shard marks a claim done when the next
    item is requested — draining the generator up front would mark
    everything done before any processing)."""
    enhancer = _tiny_enhancer(tmp_path)
    events = []

    def recording_shard(examples, length_fn):
        for i, ex in enumerate(examples):
            events.append(('yield', i))
            yield ex

    monkeypatch.setattr(enhancer, '_prepare_example',
                        lambda ex, use_cache=False: (None, None))
    monkeypatch.setattr(enhancer, '_dispatch_loaded',
                        lambda ex, ref, obs: (np.zeros(100, np.float32),
                                              None))
    monkeypatch.setattr(enhancer, '_finish_dispatched',
                        lambda handle, trim: handle)
    enhancer.enhance_session(
        ['S02'], tmp_path / 'audio', audio_dir_exist_ok=True,
        shard_fn=recording_shard,
        progress=lambda eid: events.append(('done', eid)))
    yields_before_first_done = [e for e in events[:events.index(
        next(e for e in events if e[0] == 'done'))] if e[0] == 'yield']
    # prefetch window (2) + dispatch-ahead (1) bound the read-ahead
    assert len(yields_before_first_done) <= 4, events


def test_on_error_skip(tmp_path, monkeypatch):
    enhancer = _tiny_enhancer(tmp_path)
    bad_id = {}

    def boom(ex):
        bad_id.setdefault('id', ex['example_id'])
        if ex['example_id'] == bad_id['id']:
            raise RuntimeError('synthetic failure')
        return np.zeros(100, np.float32)

    monkeypatch.setattr(enhancer, '_prepare_example',
                        lambda ex, use_cache=False: (None, None))
    monkeypatch.setattr(enhancer, '_dispatch_loaded',
                        lambda ex, ref, obs: (boom(ex), None))
    monkeypatch.setattr(
        enhancer, '_finish_dispatched',
        lambda handle, trim: handle)
    out = tmp_path / 'audio'
    enhancer.enhance_session(['S02'], out, dataset_slice=2,
                             audio_dir_exist_ok=True, on_error='skip')
    wavs = list((out / 'dev').glob('*.wav'))
    assert len(wavs) == 1  # one failed, one succeeded
    with pytest.raises(RuntimeError):
        enhancer.enhance_session(['S02'], out, dataset_slice=2,
                                 audio_dir_exist_ok=True,
                                 on_error='raise')
