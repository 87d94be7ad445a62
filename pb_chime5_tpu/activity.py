"""Rasterize per-utterance time annotations into per-(session, perspective,
speaker) boolean activity tracks.

Behavioural rebuild of pb_chime5/activity.py:8-404.

``get_activity`` returns ``dict[session][perspective][speaker] ->
ArrayInterval`` (or dense bool array) where perspective is

* ``'worn'``: one track set per worn mic ('P05', ...),
* ``'global_worn'``: a single 'P' perspective using each utterance's own
  target speaker's worn-mic clock,
* ``'array'``: one per microphone array ('U01', ...) using that array's
  (drift-adjusted) clock.

``garbage_class``: True -> an always-on 'Noise' class, False -> always-off,
None -> no noise class, int n -> n always-on 'Noise<i>' classes
(reference activity.py:150-176).

``non_sil_alignment_fn(ex, perspective_mic_array)`` optionally refines an
utterance's span with a sample-level non-silence mask (Kaldi alignments);
if it returns scalar 1 the refinement was missing and a sanity counter is
incremented (reference activity.py:201-221).
"""

import functools

import numpy as np

from pb_chime5_tpu import mapping
from pb_chime5_tpu.utils import ArrayInterval
from pb_chime5_tpu.utils.dict_utils import Dispatcher

__all__ = ['get_activity', 'get_activity_chime6']

# reference activity.py:344: CHiME-6 sessions use one global clock; tracks
# are allocated "long enough" and sliced by the caller.
CHIME6_MAX_NUM_SAMPLES = 60 * 60 * 16000 * 10


def _make_zeros_ones(use_array_interval, dtype):
    if use_array_interval:
        assert dtype == bool, dtype

        def zeros(shape):
            return ArrayInterval(shape)

        def ones(shape):
            arr = ArrayInterval(shape)
            arr[:] = 1
            return arr
    else:
        zeros = functools.partial(np.zeros, dtype=dtype)
        ones = functools.partial(np.ones, dtype=dtype)
    return zeros, ones


def _add_garbage_class(tracks, garbage_class, num_samples, zeros, ones):
    if garbage_class is True:
        tracks['Noise'] = ones(shape=[num_samples])
    elif garbage_class is False:
        tracks['Noise'] = zeros(shape=[num_samples])
    elif garbage_class is None:
        pass
    elif isinstance(garbage_class, int) and garbage_class > 0:
        for i in range(garbage_class):
            tracks[f'Noise{i}'] = ones(shape=[num_samples])
    else:
        raise ValueError(garbage_class)


def get_activity(
        iterator,
        *,
        perspective,
        garbage_class,
        dtype=bool,
        non_sil_alignment_fn=None,
        debug=False,
        use_ArrayIntervall=True,
):
    sessions = iterator.groupby(lambda ex: ex['session_id'])

    all_activity = Dispatcher()
    for session_id, it_s in sessions.items():
        if perspective == 'worn':
            perspectives = mapping.session_to_speakers[session_id]
        elif perspective == 'global_worn':
            perspectives = ['P']
        elif perspective == 'array':
            # the mapping already excludes missing arrays
            perspectives = mapping.session_to_arrays[session_id]
        else:
            perspectives = (perspective if isinstance(
                perspective, (tuple, list)) else [perspective])

        speaker_ids = mapping.session_to_speakers[session_id]
        zeros, ones = _make_zeros_ones(use_ArrayIntervall, dtype)

        all_activity[session_id] = Dispatcher({
            p: Dispatcher({
                s: zeros(shape=[
                    mapping.session_array_to_num_samples[
                        f'{session_id}_{p}']])
                for s in speaker_ids
            })
            for p in perspectives
        })
        for p in perspectives:
            _add_garbage_class(
                all_activity[session_id][p], garbage_class,
                mapping.session_array_to_num_samples[f'{session_id}_{p}'],
                zeros, ones)

        missing_count = 0
        num_examples = len(it_s)
        for ex in it_s:
            if ex['transcription'] == '[redacted]':
                continue
            target_speaker = ex['speaker_id']
            for pers in perspectives:
                perspective_mic_array = (
                    target_speaker if pers == 'P' else pers)

                if perspective_mic_array.startswith('P'):
                    start = ex['start']['worn'][perspective_mic_array]
                    end = ex['end']['worn'][perspective_mic_array]
                else:
                    if perspective_mic_array not in \
                            ex['audio_path']['observation']:
                        continue
                    start = ex['start']['observation'][
                        perspective_mic_array]
                    end = ex['end']['observation'][perspective_mic_array]

                if non_sil_alignment_fn is None:
                    value = 1
                else:
                    value = non_sil_alignment_fn(ex, perspective_mic_array)
                    if np.isscalar(value) and value == 1:
                        missing_count += 1

                all_activity[session_id][pers][target_speaker][
                    start:end] = value

        if missing_count > num_examples // 2:
            raise RuntimeError(
                f'Expected at most {num_examples // 2} missing finetuned '
                f'annotations for session {session_id}, got '
                f'{missing_count} — assume something went wrong.')
    return all_activity


def get_activity_chime6(
        iterator,
        *,
        garbage_class,
        dtype=bool,
        non_sil_alignment_fn=None,
        debug=False,
        use_ArrayIntervall=True,
):
    """CHiME-6 variant: one global clock, flat start/end ints, no
    perspectives (reference activity.py:228-404)."""
    sessions = iterator.groupby(lambda ex: ex['session_id'])

    all_activity = Dispatcher()
    for session_id, it_s in sessions.items():
        speaker_ids = mapping.session_to_speakers[session_id]
        zeros, ones = _make_zeros_ones(use_ArrayIntervall, dtype)

        all_activity[session_id] = Dispatcher({
            s: zeros(shape=[CHIME6_MAX_NUM_SAMPLES]) for s in speaker_ids
        })
        _add_garbage_class(
            all_activity[session_id], garbage_class,
            CHIME6_MAX_NUM_SAMPLES, zeros, ones)

        for ex in it_s:
            if ex['transcription'] == '[redacted]':
                continue
            if non_sil_alignment_fn is None:
                value = 1
            else:
                raise NotImplementedError(non_sil_alignment_fn)
            all_activity[session_id][ex['speaker_id']][
                ex['start']:ex['end']] = value
    return all_activity
