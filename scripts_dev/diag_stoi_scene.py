"""Measure STOI (testing/metrics.py) of the full chain on the realistic
scenes, to derive a robust intelligibility pin (VERDICT r4 #7).

Reference signal: the TARGET's reverberant image at mic 0
(scene['images'][0, 0]) — the scene generator returns per-source images
exactly so metrics can be exact.  Using the reverberant image (not the
dry source) means the metric asks "did the chain preserve/recover the
target as heard at the array", not "did it dereverberate" — WPE's
dereverberation then shows up as a small REFERENCE mismatch, which is
why the pin must be derived from measured distributions, not assumed.

Two evaluation regions per seed:

* span    — the full target-active span: most of it is interference-free,
            so raw ch0 already correlates well; enhancement mostly has
            artifacts to lose here (this is the musical-noise tripwire).
* overlap — the region where BOTH talkers are active: raw ch0 carries the
            interferer, enhancement must win here or it is not doing its
            job (the intelligibility twin of the SIR gate).

Run:  python scripts_dev/diag_stoi_scene.py [n_seeds]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from pb_chime5_tpu.models.gss import GssConfig, gss_enhance
from pb_chime5_tpu.testing.metrics import stoi
from pb_chime5_tpu.testing.rooms import make_reverberant_scene
from pb_chime5_tpu.utils import activity_time_to_frequency

FS = 16000
N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

rows = {}
for seed in range(N_SEEDS):
    rng = np.random.default_rng(seed)
    scene = make_reverberant_scene(
        rng, num_speakers=2, duration=8.0, rt60=0.45, noise_snr_db=20.0)
    obs = scene['obs'].astype(np.float32)
    ref = scene['images'][0, 0]
    (a0, a1), (b0, b1) = scene['spans']
    span = slice(a0, a1)
    lo, hi = max(a0, b0), min(a1, b1)
    overlap = slice(lo, hi)
    assert hi - lo > FS, (seed, hi - lo)

    sigs = {'raw': obs[0]}
    for postfilter in (None, 'mask_mul'):
        config = GssConfig(bss_iterations=10, postfilter=postfilter)
        act_f = activity_time_to_frequency(
            scene['activity'], config.stft_size, config.stft_shift,
            stft_fading=config.stft_fading, stft_pad=True).astype(np.int8)
        x_hat, _ = gss_enhance(jnp.asarray(obs), jnp.asarray(act_f),
                               jnp.int32(0), config=config)
        sigs['bf' if postfilter is None else 'mm'] = np.asarray(x_hat)

    r = {}
    for name, x in sigs.items():
        r[f'{name}_span'] = stoi(ref[span], x[span])
        r[f'{name}_ovl'] = stoi(ref[overlap], x[overlap])
    rows[seed] = r
    print(f"seed {seed}:  span raw {r['raw_span']:.3f} "
          f"bf {r['bf_span']:.3f} mm {r['mm_span']:.3f}   "
          f"overlap raw {r['raw_ovl']:.3f} bf {r['bf_ovl']:.3f} "
          f"mm {r['mm_ovl']:.3f}", flush=True)

for key in ('raw_span', 'bf_span', 'mm_span', 'raw_ovl', 'bf_ovl',
            'mm_ovl'):
    vals = [rows[s][key] for s in rows]
    print(f'{key:9s} median {np.median(vals):.3f}  '
          f'min {min(vals):.3f}  max {max(vals):.3f}')
for a, b in (('mm_span', 'bf_span'), ('bf_ovl', 'raw_ovl'),
             ('mm_ovl', 'raw_ovl')):
    d = [rows[s][a] - rows[s][b] for s in rows]
    print(f'{a} - {b}: median {np.median(d):+.3f}  '
          f'per-seed {[round(x, 3) for x in d]}')
