"""CHiME-6 track-2 enhancer: activity from RTTM diarization.

Behavioural rebuild of pb_chime5/core_chime6_rttm.py: the database is
built from audio-file globs + RTTM intervals (no transcriptions), the
activity provider reads a (possibly different) RTTM file, audio is read
eagerly through the min-length-truncating loader, and each failing
example prints its id before re-raising (core_chime6_rttm.py:168-185).
"""

import dataclasses
import functools
from pathlib import Path

import numpy as np

from pb_chime5_tpu import mapping
from pb_chime5_tpu.database.rttm import (
    RTTMDatabase, get_chime6_files, groupby, normalize_rttm_file_ids)
from pb_chime5_tpu.io import dump_audio
from pb_chime5_tpu.models.gss import GssConfig, GssPipeline
from pb_chime5_tpu.models.enhancer import (
    DEFAULT_LENGTH_BUCKETS, async_session_pump)
from pb_chime5_tpu.models.enhancer_chime6 import start_end_context_frames
from pb_chime5_tpu.parallel.scheduler import length_balanced_shard
from pb_chime5_tpu.utils.activity_freq import activity_time_to_frequency
from pb_chime5_tpu.utils.array_interval import (
    ArrayInterval, array_intervals_from_rttm)

__all__ = ['Activity', 'Enhancer', 'get_database', 'get_enhancer']


def _always(value):
    ai = ArrayInterval(None)
    if value:
        ai[0:10 * 3600 * 16000] = 1   # "ones": 10 h horizon
    return ai


@dataclasses.dataclass(eq=False)
class Activity:
    """[session][speaker] activity from an RTTM file
    (reference core_chime6_rttm.py:31-69)."""
    garbage_class: bool = False
    rttm: str = None

    @functools.cached_property
    def _data(self):
        data = {}
        paths = self.rttm
        if isinstance(paths, (str, Path)):
            paths = [paths]
        for p in paths:
            for file_id, speakers in array_intervals_from_rttm(p).items():
                data.setdefault(file_id, {}).update(speakers)
        return normalize_rttm_file_ids(data)

    def __getitem__(self, session_id):
        data = dict(self._data[session_id])
        if self.garbage_class is False:
            data['Noise'] = _always(False)
        elif self.garbage_class is True:
            data['Noise'] = _always(True)
        elif self.garbage_class is None:
            pass
        else:
            raise ValueError(self.garbage_class)
        return data


@dataclasses.dataclass
class Enhancer:
    activity: Activity
    gss_config: GssConfig
    db: RTTMDatabase

    bf_drop_context: bool = True
    context_samples: int = 240000
    length_buckets: tuple = DEFAULT_LENGTH_BUCKETS
    compute_dtype: object = np.float32
    # in-graph output trim (see models/enhancer.py Enhancer.device_trim)
    device_trim: bool = True

    def __post_init__(self):
        self._pipeline = GssPipeline(
            self.gss_config,
            length_buckets=(list(self.length_buckets)
                            if self.length_buckets else None),
            dtype=self.compute_dtype,
            device_trim=self.device_trim)

    @property
    def stft_size(self):
        return self.gss_config.stft_size

    @property
    def stft_shift(self):
        return self.gss_config.stft_shift

    @property
    def stft_fading(self):
        return self.gss_config.stft_fading

    def get_dataset(self, session_id):
        return self.db.get_dataset_for_session(
            session_id,
            audio_read=True,
            adjust_times=False,
            context_samples=self.context_samples,
            equal_start_context=False,
        )

    def enhance_session(
            self,
            session_ids,
            audio_dir,
            dataset_slice=False,
            audio_dir_exist_ok=False,
            is_master=True,
            shard_fn=length_balanced_shard,
            progress=None,
    ):
        audio_dir = Path(audio_dir)
        it = self.get_dataset(session_ids)

        if is_master:
            audio_dir.mkdir(exist_ok=audio_dir_exist_ok, parents=True)
            for dataset in set(mapping.session_to_dataset.values()):
                (audio_dir / dataset).mkdir(exist_ok=True)

        if dataset_slice is not False:
            if dataset_slice is True:
                it = it[:2]
            elif isinstance(dataset_slice, int):
                it = it[:dataset_slice]
            elif isinstance(dataset_slice, slice):
                it = it[dataset_slice]
            else:
                raise ValueError(dataset_slice)

        # shard on metadata only; the eager audio read happens per-example
        # after sharding
        meta = self.db.get_dataset_for_session(
            session_ids, audio_read=False,
            context_samples=self.context_samples)
        example_ids = list(it.keys())
        lengths = {eid: meta[eid]['num_samples'] for eid in example_ids}

        # Async session loop sharing the CHiME-5 driver's pump: the
        # eager min-length-truncating audio read (the RTTM variant's
        # I/O, reference core_chime6_rttm.py:529-547) runs on the
        # prefetch thread, the device program is dispatched ahead, and
        # the writer thread blocks on results + writes WAVs.  Error
        # semantics stay the reference's: print the failing example id,
        # then re-raise (core_chime6_rttm.py:168-185) = on_error='raise'.
        def dispatch(example_id, ex):
            activity_freq, target_index, start_cf, end_cf = \
                self._device_args(ex)
            trim = ((ex['start_orig'] - ex['start'],
                     ex['num_samples_orig'])
                    if self.context_samples > 0 else None)
            # the pipeline applies the trim (in-graph when profitable,
            # GssPipeline._plan_trim) — gather returns the emitted
            # waveform
            handle = self._pipeline.dispatch(
                ex['audio_data'], activity_freq, target_index,
                start_context_frames=start_cf, end_context_frames=end_cf,
                trim=trim)
            return example_id, handle, None, ex['session_id']

        def finish(example_id, handle, trim, session_id):
            x_hat = self._pipeline.gather(handle)
            if trim is not None:
                x_hat = x_hat[..., trim[0]:trim[0] + trim[1]]
            assert x_hat.ndim == 1, x_hat.shape
            dataset = mapping.session_to_dataset[session_id]
            dump_audio(x_hat, audio_dir / dataset / f'{example_id}.wav')
            if progress is not None:
                progress(example_id)

        async_session_pump(
            shard_fn(example_ids, lengths.__getitem__),
            it.__getitem__, dispatch, finish, lambda eid: eid,
            on_error='raise')

    def _example_activity(self, ex):
        return {
            k: arr[ex['start']:ex['end']]
            for k, arr in self.activity[ex['session_id']].items()
        }

    def _device_args(self, ex, ex_array_activity=None, speaker_id=None):
        """Host prep shared by the async dispatch and the public
        enhance_observation: (activity_freq, target_index,
        start/end context frames)."""
        if ex_array_activity is None:
            ex_array_activity = self._example_activity(ex)
        if speaker_id is None:
            speaker_id = ex['speaker_id']
        activity_freq = activity_time_to_frequency(
            np.array(list(ex_array_activity.values())),
            stft_window_length=self.stft_size,
            stft_shift=self.stft_shift,
            stft_fading=self.stft_fading,
            stft_pad=True,
        )
        if self.bf_drop_context:
            start_cf, end_cf = start_end_context_frames(
                ex, stft_size=self.stft_size,
                stft_shift=self.stft_shift,
                stft_fading=self.stft_fading)
        else:
            start_cf = end_cf = 0
        target_index = tuple(ex_array_activity.keys()).index(speaker_id)
        return activity_freq, target_index, start_cf, end_cf

    def enhance_example(self, ex):
        x_hat = self.enhance_observation(
            ex['audio_data'],
            ex_array_activity=self._example_activity(ex),
            speaker_id=ex['speaker_id'], ex=ex)

        if self.context_samples > 0:
            start_context = ex['start_orig'] - ex['start']
            x_hat = x_hat[..., start_context:
                          start_context + ex['num_samples_orig']]
        return x_hat

    def enhance_observation(self, obs, ex_array_activity, speaker_id,
                            ex=None):
        activity_freq, target_index, start_cf, end_cf = \
            self._device_args(ex, ex_array_activity, speaker_id)
        x_hat, _ = self._pipeline(
            obs, activity_freq, target_index,
            start_context_frames=start_cf,
            end_context_frames=end_cf,
        )
        return x_hat


def get_database(chime6_dir, rttm, multiarray):
    """Audio-glob database per multiarray policy (reference
    core_chime6_rttm.py:288-357)."""
    chime6_dir = Path(chime6_dir)
    if multiarray is True:
        audio_paths = get_chime6_files(chime6_dir, worn=False, flat=True)
    elif multiarray == 'outer_array_mics':
        nested = get_chime6_files(chime6_dir, worn=False, flat=False)
        audio_paths = {
            session: [f for files in arrays.values()
                      for f in (files[0], files[-1])]
            for session, arrays in nested.items()
        }
    elif multiarray == 'first_array_mics':
        nested = get_chime6_files(chime6_dir, worn=False, flat=False)
        audio_paths = {
            session: [files[0] for files in arrays.values()]
            for session, arrays in nested.items()
        }
    else:
        raise ValueError(multiarray)

    alias_files = sorted(chime6_dir.glob('transcriptions/*/*.json'))
    alias = groupby(alias_files, lambda p: p.parts[-2],
                    lambda p: p.with_suffix('').name)
    return RTTMDatabase(rttm, audio_paths, alias=alias)


def get_enhancer(
    database_rttm,
    activity_rttm,
    chime6_dir='CHiME6',
    multiarray='outer_array_mics',
    context_samples=240000,

    wpe=True,
    wpe_tabs=10,
    wpe_delay=2,
    wpe_iterations=3,
    wpe_psd_context=0,

    activity_garbage_class=True,

    stft_size=1024,
    stft_shift=256,
    stft_fading=True,

    bss_iterations=20,
    bss_iterations_post=1,

    bf_drop_context=True,

    bf='mvdrSouden_ban',
    postfilter=None,

    length_buckets=DEFAULT_LENGTH_BUCKETS,
    compute_dtype=np.float32,
):
    """Factory mirroring pb_chime5/core_chime6_rttm.py:360-422."""
    assert wpe is True or wpe is False, wpe
    if str(bf).startswith('lcmv'):
        assert activity_garbage_class not in (False, None), (
            'bf=lcmv requires a garbage (noise) class: set '
            'activity_garbage_class=True')
    db = get_database(chime6_dir, database_rttm, multiarray)
    return Enhancer(
        db=db,
        activity=Activity(
            garbage_class=activity_garbage_class,
            rttm=activity_rttm,
        ),
        gss_config=GssConfig(
            stft_size=stft_size, stft_shift=stft_shift,
            stft_fading=stft_fading,
            wpe=wpe, wpe_taps=wpe_tabs, wpe_delay=wpe_delay,
            wpe_iterations=wpe_iterations, wpe_psd_context=wpe_psd_context,
            bss_iterations=bss_iterations,
            bss_iterations_post=bss_iterations_post,
            bf=bf, postfilter=postfilter,
        ),
        bf_drop_context=bf_drop_context,
        context_samples=context_samples,
        length_buckets=length_buckets,
        compute_dtype=compute_dtype,
    )
