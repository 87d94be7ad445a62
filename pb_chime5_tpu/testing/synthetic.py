"""Generate a miniature CHiME-5-format dataset (audio + transcriptions).

The reference CI fakes its backend by generating a dummy CHiME-6 tree from
CHiME-5 data (reference scripts/simulate_chime6_transcriptions.py,
jenkins.bash:41-45).  Without access to the corpus we go one step further:
synthesize the whole corpus — session-long multichannel array WAVs, worn
stereo WAVs, and challenge-format transcription JSONs — using the *real*
session ids / speaker ids / array lists from the corpus fact tables so
every downstream mapping lookup works unchanged.

Scene model per session: each speaker utters noise bursts with distinct
spectral tilts in mostly-disjoint time slots; each array microphone
observes a random-FIR mixture of all speakers plus sensor noise; each
array's clock is offset by a per-array drift (array time = worn/original
time + drift) and utterance boundary jitter, so ``adjust_start_end`` /
``equal_start_context`` have real work to do.
"""

import decimal
from pathlib import Path

import numpy as np

from pb_chime5_tpu import mapping

SAMPLE_RATE = 16000

__all__ = ['create_synthetic_chime5', 'samples_to_time_str',
           'SAMPLE_RATE']


def samples_to_time_str(samples: int) -> str:
    """Inverse of the DB builder's ``to_samples`` (reference
    get_speaker_activity.py:80-135): exact 'H:MM:SS.fffffff' at 16 kHz."""
    hours, rem = divmod(int(samples), 3600 * SAMPLE_RATE)
    minutes, rem = divmod(rem, 60 * SAMPLE_RATE)
    seconds = decimal.Decimal(rem) / SAMPLE_RATE
    # 7 fractional digits represent 1/16000 s exactly (10^7 / 16000 = 625)
    sec_str = f'{seconds:.7f}'.rstrip('0').rstrip('.')
    if '.' not in sec_str:
        sec_str += '.0'
    whole, frac = sec_str.split('.')
    return f'{hours}:{minutes:02d}:{int(whole):02d}.{frac}'


def _speech_like(rng, n, tilt):
    burst = rng.standard_normal(n)
    envelope = np.abs(rng.standard_normal(max(n // 400, 1) + 1))
    envelope = np.repeat(envelope, 400)[:n]
    return np.convolve(burst * envelope, tilt, mode='same')


def create_synthetic_chime5(
        root,
        session_ids=('S02',),
        duration_seconds=30.0,
        utterances_per_speaker=3,
        num_arrays=2,
        num_array_mics=4,
        seed=0,
        clock_drift=True,
        chime6=False,
        pcm16=False,
):
    """Write a CHiME-5-format database tree under ``root``.

    Layout (matching the corpus layout the DB builder expects,
    reference create_json.py:254-528):
        root/audio/<dataset>/<S>_<U>.CH<i>.wav     array channels
        root/audio/<dataset>/<S>_<P>.wav           worn stereo
        root/transcriptions/<dataset>/<S>.json     challenge format

    Returns a dict with the per-session ground-truth source signals and
    utterance tables for test assertions:
        {'root': Path, 'sessions': {sid: {'sources': (K, N) float32,
         'utterances': [...], 'arrays': [...], 'speakers': [...]}}}
    """
    import json

    root = Path(root)
    rng = np.random.default_rng(seed)
    N = int(duration_seconds * SAMPLE_RATE)
    info = {'root': root, 'sessions': {}}

    for sid in session_ids:
        speakers = mapping.session_to_speakers[sid]
        arrays = mapping.session_to_arrays[sid][:num_arrays]
        dataset = mapping.session_to_dataset[sid]
        audio_dir = root / 'audio' / dataset
        trans_dir = root / 'transcriptions' / dataset
        audio_dir.mkdir(parents=True, exist_ok=True)
        trans_dir.mkdir(parents=True, exist_ok=True)

        K = len(speakers)
        tilts = [rng.standard_normal(4) for _ in range(K)]
        sources = np.zeros((K, N), np.float32)
        utterances = []

        # Mostly-disjoint utterance slots; margin keeps them away from the
        # session edges so +-context windows have room.
        slot = (N - 2 * SAMPLE_RATE) // (K * utterances_per_speaker)
        pos = SAMPLE_RATE
        for u in range(utterances_per_speaker):
            for k, spk in enumerate(speakers):
                length = rng.integers(int(0.5 * slot), int(0.8 * slot))
                start = pos + rng.integers(0, slot - length)
                end = start + length
                sources[k, start:end] = _speech_like(
                    rng, end - start, tilts[k]).astype(np.float32)
                utterances.append(
                    {'speaker': spk, 'start': int(start), 'end': int(end)})
                pos += slot
        utterances.sort(key=lambda x: x['start'])

        # worn stereo: own speech loud + others faint
        from pb_chime5_tpu.io import dump_audio

        def write(x, path):
            if pcm16:
                # like the real corpus: 16-bit PCM
                dump_audio(np.clip(x, -1, 1 - 2 ** -15), path,
                           normalize=False, dtype=np.int16)
            else:
                dump_audio(x, path, normalize=False, dtype=None)

        for k, spk in enumerate(speakers):
            own = sources[k]
            bleed = 0.1 * (sources.sum(0) - own)
            stereo = np.stack([own + bleed, 0.9 * (own + bleed)])
            stereo = stereo + 0.01 * rng.standard_normal(stereo.shape)
            write(stereo * 0.1, audio_dir / f'{sid}_{spk}.wav')

        # arrays: random FIR mixtures, per-array clock drift
        drifts = {}
        for a, arr in enumerate(arrays):
            drift = int(rng.integers(100, 500)) if clock_drift else 0
            drifts[arr] = drift
            mics = np.zeros((num_array_mics, N + drift), np.float32)
            for m in range(num_array_mics):
                mix = np.zeros(N, np.float32)
                for k in range(K):
                    h = rng.standard_normal(6) * (0.8 ** np.arange(6))
                    mix += np.convolve(sources[k], h, mode='same')
                mics[m, drift:] = mix
            mics += 0.01 * rng.standard_normal(mics.shape).astype(
                np.float32)
            for m in range(num_array_mics):
                write(mics[m] * 0.05,
                      audio_dir / f'{sid}_{arr}.CH{m + 1}.wav')

        # challenge-format transcription JSON
        trans = []
        for i, utt in enumerate(utterances):
            start, end, spk = utt['start'], utt['end'], utt['speaker']
            if chime6:
                entry = {
                    'session_id': sid,
                    'speaker': spk,
                    'words': f'utterance {i}',
                    'start_time': int(start),
                    'end_time': int(end),
                }
            else:
                jitter = (lambda: int(rng.integers(-3, 4))) if clock_drift \
                    else (lambda: 0)
                start_times = {'original': samples_to_time_str(start)}
                end_times = {'original': samples_to_time_str(end)}
                for spk2 in speakers:
                    start_times[spk2] = samples_to_time_str(start)
                    end_times[spk2] = samples_to_time_str(end)
                for arr in arrays:
                    s_arr = start + drifts[arr] + jitter()
                    e_arr = end + drifts[arr] + jitter()
                    start_times[arr] = samples_to_time_str(s_arr)
                    end_times[arr] = samples_to_time_str(e_arr)
                entry = {
                    'session_id': sid,
                    'speaker': spk,
                    'words': f'utterance {i}',
                    'start_time': start_times,
                    'end_time': end_times,
                }
            if dataset == 'dev':
                entry['location'] = 'kitchen'
                entry['ref'] = arrays[0]
            trans.append(entry)
        (trans_dir / f'{sid}.json').write_text(json.dumps(trans, indent=1))

        info['sessions'][sid] = {
            'sources': sources,
            'utterances': utterances,
            'arrays': list(arrays),
            'speakers': list(speakers),
            'drifts': drifts,
            'num_samples': N,
        }
    return info
