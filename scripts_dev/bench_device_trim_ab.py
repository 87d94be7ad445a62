"""Dev A/B: in-graph output trim (GssPipeline.device_trim) on vs off,
interleaved.

Without the trim every utterance downloads its full ±context span
(~34 s of f32 at the bench shape, ~2.2 MB); with it only the bucketed
emitted region crosses the device->host boundary (~0.3-0.4 MB).  Over
the bandwidth-drifting dev tunnel the verdict needs interleaved
same-moment passes (see bench_prefetch_ab.py).  One enhancer, one
corpus, one warmup (which AOT-compiles BOTH program variants); the
toggle is the pipeline's `device_trim` attribute, read per dispatch.
Outputs are bit-identical either way (tests/test_device_trim.py); the
first interleaved pair is byte-compared here too as a belt-and-braces
check.

Run: python scripts_dev/bench_device_trim_ab.py [rounds]
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
        for r in range(rounds):
            for flag in (False, True):
                enhancer._pipeline.device_trim = flag
                before = dict(enhancer._audio_cache.stats) \
                    if enhancer._audio_cache is not None else {}
                t0 = time.perf_counter()
                enhancer.enhance_session(['S02'], work / f'p{i}',
                                         audio_dir_exist_ok=True)
                wall = time.perf_counter() - t0
                delta = {k: round(v - before.get(k, 0), 4)
                         for k, v in enhancer._audio_cache.stats.items()} \
                    if enhancer._audio_cache is not None else {}
                results[flag].append(wall)
                print(f'device_trim={flag!s:5} wall={wall:6.2f}s '
                      f'xRT={span_s / wall:6.2f} {delta}', flush=True)
                if r == 0 and flag:
                    a = sorted((work / 'p0').rglob('*.wav'))
                    b = sorted((work / 'p1').rglob('*.wav'))
                    assert len(a) == len(b) and all(
                        x.read_bytes() == y.read_bytes()
                        for x, y in zip(a, b)), \
                        'device_trim arms are NOT byte-identical'
                    print('arms byte-identical over '
                          f'{len(a)} wavs', flush=True)
                    shutil.rmtree(work / 'p0', ignore_errors=True)
                if not (r == 0 and not flag):   # keep p0 for the compare
                    shutil.rmtree(work / f'p{i}', ignore_errors=True)
                i += 1
        for flag in (False, True):
            w = sorted(results[flag])
            med = w[len(w) // 2]
            print(f'MEDIAN device_trim={flag!s:5}: wall={med:6.2f}s '
                  f'xRT={span_s / med:6.2f}  (runs: '
                  f'{[round(x, 2) for x in results[flag]]})')
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
