"""Static CHiME-5 corpus fact tables.

The tables (session -> speakers / arrays / dataset split, per-track sample
counts, dev reference arrays) are published facts about the CHiME-5 corpus;
they are stored as a JSON resource (data/chime5_mapping.json, extracted
from the reference's pb_chime5/mapping.py:12-289 and
database/chime5/mapping.py:5-8) and exposed with the same names the
reference uses.
"""

import json
from pathlib import Path

from pb_chime5_tpu.utils.dict_utils import Dispatcher

_DATA = json.loads(
    (Path(__file__).parent / 'data' / 'chime5_mapping.json').read_text())

session_to_speakers = Dispatcher(_DATA['session_to_speakers'])
session_to_dataset = Dispatcher(_DATA['session_to_dataset'])
session_to_arrays = Dispatcher(_DATA['session_to_arrays'])
session_array_to_num_samples = Dispatcher(
    _DATA['session_array_to_num_samples'])
dev_session_to_reference_arrays = Dispatcher(
    _DATA['dev_session_to_reference_arrays'])

session_ids = tuple(sorted(session_to_dataset.keys()))

dataset_to_sessions = Dispatcher({
    ds: sorted(s for s, d in session_to_dataset.items() if d == ds)
    for ds in sorted(set(session_to_dataset.values()))
})

__all__ = [
    'Dispatcher',
    'session_to_speakers', 'session_to_dataset', 'session_to_arrays',
    'session_array_to_num_samples', 'dev_session_to_reference_arrays',
    'session_ids', 'dataset_to_sessions',
]
