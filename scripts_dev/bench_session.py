"""Dev bench: real end-to-end enhance_session throughput on the chip.

24-channel (6 arrays x 4 mics) synthetic CHiME-5 session, PCM16 WAVs,
full default enhancement config, one length bucket.  First pass pays the
compile; the second pass measures steady state.

Run: PYTHONPATH=/root/.axon_site:$PYTHONPATH python scripts_dev/bench_session.py
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, '.')


def main():
    from pb_chime5_tpu.testing import create_synthetic_chime5
    from pb_chime5_tpu.database.create_json import create_database
    from pb_chime5_tpu.io import dump_json
    from pb_chime5_tpu.models.enhancer import get_enhancer

    work = Path(tempfile.mkdtemp())
    create_synthetic_chime5(
        work / 'CHiME5', session_ids=('S02',), duration_seconds=120.0,
        utterances_per_speaker=2, num_arrays=6, num_array_mics=4,
        seed=3, pcm16=True)
    dump_json(create_database(work / 'CHiME5'), work / 'chime5.json')

    enhancer = get_enhancer(
        database_path=str(work / 'chime5.json'),
        multiarray=True,
        length_buckets=(16000 * 42,),
        compile_mode='fast_start',
    )
    examples = list(enhancer.get_iterator('S02'))
    spans = [ex['end']['original'] - ex['start']['original']
             for ex in examples]
    print(f'{len(examples)} utterances, processed span '
          f'{sum(spans)/16000:.0f} s total')

    t0 = time.perf_counter()
    enhancer._pipeline.warmup(24, 5)
    print(f'warmup (fast_start, parallel): {time.perf_counter()-t0:.1f} s')

    for label in ('pass1 (first dispatches)', 'pass2 (steady state)'):
        out = work / label.split()[0]
        t0 = time.perf_counter()
        enhancer.enhance_session(['S02'], out, audio_dir_exist_ok=True)
        wall = time.perf_counter() - t0
        n_wav = len(list(out.rglob('*.wav')))
        xrt = (sum(spans) / 16000) / wall
        print(f'{label}: {wall:.1f} s for {n_wav} wavs -> '
              f'{wall/len(examples):.2f} s/utt, {xrt:.1f}x realtime')


if __name__ == '__main__':
    main()
