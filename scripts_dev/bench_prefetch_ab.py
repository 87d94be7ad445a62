"""Dev A/B: session-audio-cache window PREFETCH on vs off, interleaved.

The tunnel's bandwidth drifts minute to minute (measured 18-44 MB/s day
to day, ~30% within one bench run), so a prefetch verdict needs
interleaved same-moment passes, not two separate bench runs.  One
enhancer, one corpus, one warmup; the toggle is the cache's `prefetch`
attribute (content-neutral, outputs byte-identical either way).

Run: python scripts_dev/bench_prefetch_ab.py [rounds]
"""

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, '.')


def main(rounds=3):
    import os
    from pb_chime5_tpu.testing import create_synthetic_chime5
    from pb_chime5_tpu.database.create_json import create_database
    from pb_chime5_tpu.io import dump_json
    from pb_chime5_tpu.models.enhancer import get_enhancer

    base = '/dev/shm' if os.path.isdir('/dev/shm') else None
    work = Path(tempfile.mkdtemp(prefix='pb_ab_', dir=base))
    try:
        create_synthetic_chime5(
            work / 'CHiME5', session_ids=('S02',),
            duration_seconds=420.0, utterances_per_speaker=25,
            num_arrays=6, num_array_mics=4, seed=3, pcm16=True)
        dump_json(create_database(work / 'CHiME5'), work / 'chime5.json')
        enhancer = get_enhancer(
            database_path=str(work / 'chime5.json'), multiarray=True,
            length_buckets=(16000 * 42,), compile_mode='fast_start')
        examples = list(enhancer.get_iterator('S02'))
        span_s = sum(ex['end']['original'] - ex['start']['original']
                     for ex in examples) / 16000.0
        try:
            enhancer.warmup('S02')
        except Exception as e:
            print('warmup skipped:', repr(e)[:200])
        enhancer.enhance_session(['S02'], work / 'absorb',
                                 audio_dir_exist_ok=True)

        results = {True: [], False: []}
        i = 0
        for _ in range(rounds):
            for flag in (False, True):
                enhancer._audio_cache.prefetch = flag
                before = dict(enhancer._audio_cache.stats)
                t0 = time.perf_counter()
                enhancer.enhance_session(['S02'], work / f'p{i}',
                                         audio_dir_exist_ok=True)
                wall = time.perf_counter() - t0
                delta = {k: round(v - before.get(k, 0), 4)
                         for k, v in enhancer._audio_cache.stats.items()}
                results[flag].append(wall)
                print(f'prefetch={flag!s:5} wall={wall:6.2f}s '
                      f'xRT={span_s / wall:6.2f} {delta}', flush=True)
                shutil.rmtree(work / f'p{i}', ignore_errors=True)
                i += 1
        for flag in (False, True):
            w = min(results[flag])
            print(f'BEST prefetch={flag!s:5}: wall={w:6.2f}s '
                  f'xRT={span_s / w:6.2f}  (runs: '
                  f'{[round(x, 2) for x in results[flag]]})')
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
