"""Subprocess worker for tests/test_multiprocess.py.

Runs ``Enhancer.enhance_session`` over a synthetic corpus with one of the
host-distribution strategies (file-queue pull scheduling or deterministic
length-balanced sharding) so the test can assert that N cooperating
*processes* produce exactly the serial run's outputs — the reference's MPI
pool contract (reference core.py:381 split_managed, README "600 workers").

``--crash-after K`` hard-exits (os._exit) after K finished utterances to
exercise the crash-safety path of FileQueueScheduler stale-claim recovery.
"""

import argparse
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')


SMALL = dict(
    wpe=False, multiarray=False,
    bss_iterations=3, bss_iterations_post=1,
    context_samples=4000, length_buckets=(64000,),
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--json-path', required=True)
    p.add_argument('--audio-dir', required=True)
    p.add_argument('--mode', choices=['serial', 'queue', 'balanced'],
                   required=True)
    p.add_argument('--queue-dir')
    p.add_argument('--stale-seconds', type=float, default=3600.0)
    p.add_argument('--rank', type=int, default=0)
    p.add_argument('--world', type=int, default=1)
    p.add_argument('--crash-after', type=int, default=-1)
    p.add_argument('--resume', action='store_true')
    a = p.parse_args(argv)

    from functools import partial

    from pb_chime5_tpu.models.enhancer import get_enhancer
    from pb_chime5_tpu.parallel import (
        FileQueueScheduler, length_balanced_shard, serial_shard)

    enhancer = get_enhancer(database_path=a.json_path, **SMALL)

    if a.mode == 'queue':
        shard_fn = FileQueueScheduler(
            a.queue_dir, stale_seconds=a.stale_seconds,
            worker_id=f'w{a.rank}').shard
    elif a.mode == 'balanced':
        shard_fn = partial(length_balanced_shard,
                           process_index=a.rank, process_count=a.world)
    else:
        shard_fn = serial_shard

    done = 0

    def progress(example_id):
        nonlocal done
        done += 1
        print('FINISHED', example_id, flush=True)
        if a.crash_after >= 0 and done >= a.crash_after:
            print('CRASHING', flush=True)
            os._exit(17)

    enhancer.enhance_session(
        ['S02'], a.audio_dir,
        audio_dir_exist_ok=True, is_master=True,
        shard_fn=shard_fn, progress=progress, resume=a.resume)
    print('WORKER_OK', flush=True)


if __name__ == '__main__':
    main()
