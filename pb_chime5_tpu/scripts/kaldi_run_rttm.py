"""CHiME-6 track-2 (RTTM diarization) enhancement CLI
(reference: pb_chime5/scripts/kaldi_run_rttm.py).

    python -m pb_chime5_tpu.scripts.kaldi_run_rttm with \
        storage_dir=... chime6_dir=CHiME6 database_rttm=dev.rttm \
        [activity_rttm=...] session_id=S02 job_id=1 number_of_jobs=6000
"""

import functools
import inspect
from pathlib import Path

from pb_chime5_tpu.models.enhancer_rttm import get_enhancer
from pb_chime5_tpu.scripts.experiment import Experiment


def make_experiment(default_storage='runs'):
    experiment = Experiment('Chime6 RTTM Enhancement',
                            default_storage_dir=default_storage)
    experiment.add_config_from_signature(get_enhancer)
    experiment.add_config({
        'session_id': 'dev',
        'storage_dir': None,
        'database_rttm': None,
        'activity_rttm': None,     # defaults to database_rttm
        'job_id': 1,
        'number_of_jobs': 1,
    })

    def run(exp, test_run=False):
        cfg = dict(exp.config)
        session_id = cfg.pop('session_id')
        storage_dir = cfg.pop('storage_dir')
        job_id = cfg.pop('job_id')
        number_of_jobs = cfg.pop('number_of_jobs')
        assert storage_dir is not None, 'set storage_dir=...'
        assert cfg.get('database_rttm') is not None, 'set database_rttm=...'
        if cfg.get('activity_rttm') is None:
            cfg['activity_rttm'] = cfg['database_rttm']

        accepted = set(inspect.signature(get_enhancer).parameters)
        enhancer = get_enhancer(
            **{k: v for k, v in cfg.items() if k in accepted})

        # resolve dataset aliases through the RTTM database itself
        if isinstance(session_id, str):
            session_id = [session_id]
        alias = enhancer.db.database_dict.get('alias', {})
        sessions = sorted({
            s for key in session_id for s in alias.get(key, [key])})

        dataset_slice = slice(job_id - 1, None, number_of_jobs)
        if test_run:
            dataset_slice = slice(job_id - 1, 2 * number_of_jobs,
                                  number_of_jobs)
        from pb_chime5_tpu.parallel.scheduler import serial_shard
        enhancer.enhance_session(
            sessions,
            Path(storage_dir) / 'audio',
            dataset_slice=dataset_slice,
            audio_dir_exist_ok=True,
            shard_fn=lambda examples, length_fn: serial_shard(examples),
        )
        print('Finished', storage_dir)

    experiment._commands['main'] = run
    experiment._commands['test_run'] = functools.partial(
        run, test_run=True)
    return experiment


if __name__ == '__main__':
    make_experiment().run_commandline()
