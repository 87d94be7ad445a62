"""Host-scale session soak harness (VERDICT r4 next #2) — the ledger
curve behind docs/ARCHITECTURE.md "Host loop at production scale".

Drives pb_chime5_tpu.testing.soak.run_session_soak at 1,000+ utterances
(serial and optionally mesh) and prints the sustained per-utterance wall
vs utterance index (windowed means), the RSS curve, and the flatness /
RSS-growth statistics the slow-lane test pins.

    JAX_PLATFORMS=cpu python scripts_dev/soak_session.py [N] [--mesh]
"""

import sys
import tempfile
import shutil
import time
from pathlib import Path

import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
if '--mesh' in sys.argv and \
        'xla_force_host_platform_device_count' not in \
        os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8'
                               ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np

from pb_chime5_tpu.testing.soak import run_session_soak, windowed_means

N = next((int(a) for a in sys.argv[1:] if a.isdigit()), 1000)
WINDOW = 100

mesh = None
if '--mesh' in sys.argv:
    from pb_chime5_tpu.parallel import make_mesh
    mesh = make_mesh(data=len(jax.devices()), freq=1)

base = '/dev/shm' if os.path.isdir('/dev/shm') else None
work = Path(tempfile.mkdtemp(prefix='soak_', dir=base))
try:
    t0 = time.perf_counter()
    r = run_session_soak(work, num_utterances=N, mesh=mesh)
    total = time.perf_counter() - t0
    d = r['deltas_s']
    wm = windowed_means(d, WINDOW)
    print(f"\n=== soak: {N} utterances, mesh={'on' if mesh else 'off'} ===")
    print(f"corpus+run total {total:.1f}s; session wall {r['wall_s']:.1f}s "
          f"({r['span_s']:.0f}s audio -> {r['span_s']/r['wall_s']:.1f}x RT)")
    print(f"wavs {r['num_wavs']}/{r['num_examples']}")
    print('per-utterance wall, windowed means (window=%d):' % WINDOW)
    for i, m in enumerate(wm):
        print(f'  utts {i*WINDOW:4d}-{(i+1)*WINDOW-1:4d}: {m*1e3:7.2f} ms')
    # flatness: steady state starts at window 1 (window 0 pays compile)
    steady = wm[1:]
    print(f'flatness: last/first steady window = '
          f'{steady[-1]/steady[0]:.3f} '
          f'(max/min over steady = {steady.max()/steady.min():.3f})')
    rss = r['rss_mb']
    print('rss curve (utt, MB):', [(i, round(m, 1)) for i, m in rss])
    after_warm = [m for i, m in rss if i >= WINDOW]
    print(f'rss growth after warm-up: {after_warm[-1] - after_warm[0]:+.1f} '
          f'MB over {N - WINDOW} utterances')
    print('cache:', r['cache'])
finally:
    shutil.rmtree(work, ignore_errors=True)
