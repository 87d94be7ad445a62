"""Kaldi-style job-sharded enhancement CLI
(reference: pb_chime5/scripts/kaldi_run.py).

    python -m pb_chime5_tpu.scripts.kaldi_run with storage_dir=... \
        session_id=dev job_id=1 number_of_jobs=2000 ...

Processes examples[job_id - 1::number_of_jobs] (reference
kaldi_run.py:73-76), writing into ``storage_dir/audio`` — designed to be
launched by run.pl / slurm with thousands of jobs.
"""

import functools
import inspect
from pathlib import Path

from pb_chime5_tpu.models.enhancer import get_enhancer
from pb_chime5_tpu.scripts.experiment import Experiment
from pb_chime5_tpu.scripts.run import get_session_ids


def make_experiment(default_storage='runs'):
    experiment = Experiment('Chime5 Array Enhancement (kaldi jobs)',
                            default_storage_dir=default_storage)
    experiment.add_config_from_signature(get_enhancer)
    experiment.add_config({
        'session_id': 'dev',
        'chime6': False,
        'storage_dir': None,
        'job_id': 1,
        'number_of_jobs': 1,
    })
    experiment.named_config('multiarray', {
        'bf_drop_context': True,
        'multiarray': True,
    })

    def run(exp, test_run=False):
        cfg = dict(exp.config)
        chime6 = cfg.pop('chime6', False)
        session_id = cfg.pop('session_id')
        storage_dir = cfg.pop('storage_dir')
        job_id = cfg.pop('job_id')
        number_of_jobs = cfg.pop('number_of_jobs')
        assert storage_dir is not None, 'set storage_dir=...'
        assert 1 <= job_id <= number_of_jobs, (job_id, number_of_jobs)

        if chime6:
            from pb_chime5_tpu.models.enhancer_chime6 import (
                get_enhancer as enhancer_fn)
        else:
            enhancer_fn = get_enhancer
        accepted = set(inspect.signature(enhancer_fn).parameters)
        enhancer = enhancer_fn(
            **{k: v for k, v in cfg.items() if k in accepted})

        dataset_slice = slice(job_id - 1, None, number_of_jobs)
        if test_run:
            dataset_slice = slice(job_id - 1, 2 * number_of_jobs,
                                  number_of_jobs)
        from pb_chime5_tpu.parallel.scheduler import serial_shard
        enhancer.enhance_session(
            get_session_ids(session_id),
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
