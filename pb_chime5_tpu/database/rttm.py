"""RTTM-driven database (CHiME-6 track 2: diarization output instead of
transcription annotations).

Behavioural rebuild of pb_chime5/database/chime5/rttm.py: example dicts
are generated directly from RTTM intervals (flat start/end ints on the
global CHiME-6 clock), audio paths come from globbing the corpus tree per
multiarray policy, and dataset aliases (train/dev/eval) from the
transcription directory layout.
"""

import collections
import itertools
from pathlib import Path

import numpy as np

from pb_chime5_tpu.database import DictDatabase
from pb_chime5_tpu.database.chime5 import (
    backup_orig_start_end, adjust_start_end, AddContext)
from pb_chime5_tpu.io import load_audio
from pb_chime5_tpu.utils.array_interval import array_intervals_from_rttm

__all__ = ['groupby', 'get_chime6_files', 'RTTMDatabase',
           'Chime6RTTMDatabase',
           'recursive_load_audio', 'normalize_rttm_file_ids']


def groupby(iterable, group_fn, map_fn=None):
    """itertools.groupby -> dict of lists (reference rttm.py:11-18)."""
    groups = collections.defaultdict(list)
    for k, g in itertools.groupby(iterable, group_fn):
        groups[k].extend(g if map_fn is None else map(map_fn, g))
    return dict(groups)


def get_chime6_files(chime6_dir, worn=False, flat=False):
    """Glob the CHiME-6 audio tree (reference rttm.py:21-117).

    worn=True  -> {session: {speaker: path}}
    worn=False -> {session: {array: [4 channel paths]}}  (flat=False)
               -> {session: [all array channel paths]}   (flat=True)
    """
    chime6_dir = Path(chime6_dir)
    if worn:
        assert flat is False, flat
        files = sorted(chime6_dir.glob('audio/*/*_P*.wav'))
        out = {}
        for p in files:
            session, rest = p.name.split('_', 1)
            speaker = rest.split('.')[0]
            out.setdefault(session, {})[speaker] = str(p)
    else:
        files = sorted(chime6_dir.glob('audio/*/*_U*.wav'))
        out = {}
        for p in files:
            session, rest = p.name.split('_', 1)
            array = rest.split('.')[0]
            if flat:
                out.setdefault(session, []).append(str(p))
            else:
                out.setdefault(session, {}).setdefault(
                    array, []).append(str(p))
    assert len(out) > 0, (chime6_dir, 'no audio files found')
    return out


def normalize_rttm_file_ids(data: dict) -> dict:
    """Strip the Kaldi recipe's '_U06' / '.ENH' file-id postfixes
    (reference rttm.py:418-430)."""
    out = {k.replace('_U06', '').replace('.ENH', ''): v
           for k, v in data.items()}
    assert len(out) == len(data), (out.keys(), data.keys())
    return out


class RTTMDatabase(DictDatabase):
    """Examples from RTTM intervals + a per-session audio path list
    (reference rttm.py:285-547)."""

    def __init__(self, rttm_path, audio_paths, alias=None):
        self._rttm_path = rttm_path
        self._audio_paths = audio_paths
        self._alias = alias or {}
        self._database_dict_cache = None
        import weakref
        self._dataset_cache = weakref.WeakValueDictionary()

    @property
    def rttm(self):
        rttm = {}
        paths = self._rttm_path
        if isinstance(paths, (str, Path)):
            paths = [paths]
        for p in paths:
            for file_id, speakers in array_intervals_from_rttm(p).items():
                rttm.setdefault(file_id, {}).update(speakers)
        return normalize_rttm_file_ids(rttm)

    @staticmethod
    def example_id(file_id, speaker_id, start, end):
        """'S02_U06.-1-000000100_000000200' — the CHiME-6 Kaldi baseline
        requires the 'U06' token in the utterance id regardless of the
        arrays used (reference rttm.py:434-458)."""
        max_digits = len(str(16000 * 60 * 60 * 10))
        return (f'{file_id}_U06.-{speaker_id}-'
                f'{str(start).zfill(max_digits)}_'
                f'{str(end).zfill(max_digits)}')

    @property
    def database_dict(self):
        if self._database_dict_cache is None:
            datasets = {}
            for session_id, session in self.rttm.items():
                examples = {}
                for speaker_id, interval in session.items():
                    for start, end in interval.normalized_intervals:
                        example_id = self.example_id(
                            session_id, speaker_id, start, end)
                        examples[example_id] = {
                            'example_id': example_id,
                            'start': start,
                            'end': end,
                            'num_samples': end - start,
                            'session_id': session_id,
                            'speaker_id': speaker_id,
                            'audio_path': self._audio_paths[session_id],
                        }
                datasets[session_id] = examples
            self._database_dict_cache = {
                'datasets': datasets, 'alias': self._alias}
        return self._database_dict_cache

    def get_dataset_for_session(
            self,
            session,
            *,
            audio_read=False,
            adjust_times=False,
            context_samples=0,
            equal_start_context=False,
    ):
        if isinstance(session, str):
            session = (session,)
        it = self.get_datasets(session)

        if context_samples != 0 or adjust_times:
            it = it.map(backup_orig_start_end)
        if adjust_times:
            assert adjust_times is True, adjust_times
            it = it.map(adjust_start_end)
        if context_samples != 0:
            it = it.map(AddContext(
                context_samples, equal_start_context=equal_start_context))

        if audio_read is True:
            def load(example):
                min_num_samples = example.get(
                    'end_orig', example['end']) - example['start']
                example['audio_data'] = recursive_load_audio(
                    example['audio_path'],
                    start=example['start'],
                    stop=example['end'],
                    min_num_samples=min_num_samples,
                )
                return example
            it = it.map(load)
        elif audio_read is not False:
            raise TypeError(audio_read)
        return it


class Chime6RTTMDatabase(RTTMDatabase):
    """Convenience variant that derives audio paths and dataset aliases
    from a CHiME-6 corpus dir itself (reference rttm.py:120-282): audio
    paths = all array channels per session, aliases = dataset directory
    layout of the audio tree."""

    def __init__(self, rttm_path, chime6_dir):
        chime6_dir = Path(chime6_dir)
        audio_paths = get_chime6_files(chime6_dir, worn=False, flat=True)
        alias = {}
        for p in sorted(chime6_dir.glob('audio/*/*.wav')):
            alias.setdefault(p.parts[-2], set()).add(
                p.name.split('_')[0])
        alias = {k: sorted(v) for k, v in alias.items()}
        super().__init__(rttm_path, audio_paths, alias=alias)
        self._chime6_dir = chime6_dir

    @property
    def worn_files(self):
        return get_chime6_files(self._chime6_dir, worn=True)


def recursive_load_audio(path, *, start=0, stop=None, min_num_samples=1,
                         max_missing=8, **kwargs):
    """Load a nested path structure, tolerating missing/short tracks.

    CHiME-6 semantics (reference rttm.py:550-632): a track shorter than
    ``min_num_samples`` at this offset is dropped ("last 15 minutes of U05
    missing"); at most ``max_missing`` tracks may be dropped; remaining
    tracks are truncated to the common minimum length and stacked.
    """
    if isinstance(path, (tuple, list)):
        data = [recursive_load_audio(
            p, start=start, stop=stop,
            min_num_samples=min_num_samples, max_missing=max_missing,
            **kwargs) for p in path]
        n = len(data)
        data = [d for d in data if d is not None]
        assert len(data) >= n - max_missing, (len(data), n)
        lengths = {d.shape[-1] for d in data}
        if len(lengths) > 1:
            num_samples = min(lengths)
            assert num_samples >= min_num_samples, \
                (num_samples, min_num_samples, lengths)
            data = [d[..., :num_samples] for d in data]
        return np.array(data)
    if isinstance(path, dict):
        return {k: recursive_load_audio(
            v, start=start, stop=stop, min_num_samples=min_num_samples,
            max_missing=max_missing, **kwargs) for k, v in path.items()}
    data = load_audio(path, start=start, stop=stop, **kwargs)
    if data.shape[-1] < min_num_samples:
        return None
    return data
