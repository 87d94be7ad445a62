"""Generate a dummy CHiME-6 tree from a CHiME-5 tree (CI fixture).

Behavioural rebuild of
pb_chime5/scripts/simulate_chime6_transcriptions.py: symlinks the audio
directory and rewrites the CHiME-5 transcription JSONs (nested per-device
'H:MM:SS.f' time dicts) into CHiME-6 style (flat integer global-clock
sample times taken from the 'original' clock).

    python -m pb_chime5_tpu.scripts.simulate_chime6_transcriptions \
        <chime5_dir> <chime6_dir>
"""

import json
import sys
from pathlib import Path

from pb_chime5_tpu.database.create_json import to_samples
from pb_chime5_tpu.io import symlink


def main(chime5_dir, chime6_dir):
    chime5_dir = Path(chime5_dir).absolute()
    chime6_dir = Path(chime6_dir).absolute()
    chime6_dir.mkdir(parents=True, exist_ok=True)

    symlink(chime5_dir / 'audio', chime6_dir / 'audio', override=True)

    for json_file in sorted(chime5_dir.glob('transcriptions/*/*.json')):
        target = chime6_dir / json_file.relative_to(chime5_dir)
        target.parent.mkdir(parents=True, exist_ok=True)
        entries = json.loads(json_file.read_text())
        converted = []
        for entry in entries:
            entry = dict(entry)
            entry['start_time'] = to_samples(entry['start_time']['original'])
            entry['end_time'] = to_samples(entry['end_time']['original'])
            converted.append(entry)
        target.write_text(json.dumps(converted, indent=1))
        print(f'wrote {target}')


if __name__ == '__main__':
    main(*sys.argv[1:3])
