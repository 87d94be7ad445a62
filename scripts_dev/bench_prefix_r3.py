"""Dev: prefix-delta stage split of the CURRENT fused program (round 3,
after the real-form WPE stats).  Times stft / +wpe / +EM / +bf / full
(gss_enhance incl. istft) on the bench scene; stage costs are
differences of consecutive prefixes (the ledger's definition).

Run: python scripts_dev/bench_prefix_r3.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

from pathlib import Path
_cache = Path(__file__).resolve().parent.parent / '.jax_cache'
_cache.mkdir(exist_ok=True)
jax.config.update('jax_compilation_cache_dir', str(_cache))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

from pb_chime5_tpu.models.gss import (
    GssConfig, gss_enhance, _stft_and_mask, _wpe_stage, _em_stage,
    _bf_stage)
from pb_chime5_tpu.utils import activity_time_to_frequency

FS = 16000
SECONDS = 40.0
N = int(SECONDS * FS)
D, K = 24, 5

config = GssConfig()
rng = np.random.default_rng(0)
envelope = np.abs(rng.standard_normal(N // 800 + 1)).repeat(800)[:N]
obs = (rng.standard_normal((D, N)) * envelope * 0.1).astype(np.float32)
activity = np.zeros((K, N), bool)
for k in range(K - 1):
    activity[k, rng.integers(0, N // 2):rng.integers(N // 2, N)] = True
activity[-1] = True
act_f = activity_time_to_frequency(
    activity, config.stft_size, config.stft_shift,
    stft_fading=config.stft_fading, stft_pad=True).astype(np.int8)
ctx = 937


def timeit(name, f, *args):
    out = f(*args)
    _ = np.asarray(out)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(np.asarray(out)[0])
        ts.append(time.perf_counter() - t0)
    w = sorted(ts)[len(ts) // 2]
    print(f'{name:10s}: {w*1e3:7.1f} ms')
    return w


def main():
    o = jax.device_put(obs)
    a = jax.device_put(act_f)

    @jax.jit
    def p_stft(o, a):
        Obs, fm, _ = _stft_and_mask(o, jnp.int32(N), config)
        return jnp.sum(jnp.abs(Obs.real)).reshape(1)

    @jax.jit
    def p_wpe(o, a):
        Obs, fm, _ = _stft_and_mask(o, jnp.int32(N), config)
        Obs = _wpe_stage(Obs, config, fm)
        return jnp.sum(jnp.abs(Obs.real)).reshape(1)

    @jax.jit
    def p_em(o, a):
        Obs, fm, _ = _stft_and_mask(o, jnp.int32(N), config)
        Obs = _wpe_stage(Obs, config, fm)
        masks = _em_stage(Obs, a, config, fm)
        return jnp.sum(jnp.abs(masks)).reshape(1)

    @jax.jit
    def p_bf(o, a):
        Obs, fm, _ = _stft_and_mask(o, jnp.int32(N), config)
        Obs = _wpe_stage(Obs, config, fm)
        masks = _em_stage(Obs, a, config, fm)
        X_hat, _ = _bf_stage(Obs, masks, jnp.int32(0), config,
                             jnp.int32(ctx), jnp.int32(ctx), fm)
        return jnp.sum(jnp.abs(X_hat.real)).reshape(1)

    @jax.jit
    def p_full(o, a):
        x, _ = gss_enhance(o, a, jnp.int32(0), config=config,
                           start_context_frames=jnp.int32(ctx),
                           end_context_frames=jnp.int32(ctx))
        return jnp.sum(jnp.abs(x)).reshape(1)

    t1 = timeit('stft', p_stft, o, a)
    t2 = timeit('+wpe', p_wpe, o, a)
    t3 = timeit('+em', p_em, o, a)
    t4 = timeit('+bf', p_bf, o, a)
    t5 = timeit('full', p_full, o, a)
    print(f'deltas: wpe {1e3*(t2-t1):.1f}  em {1e3*(t3-t2):.1f}  '
          f'bf {1e3*(t4-t3):.1f}  istft+rest {1e3*(t5-t4):.1f}')


if __name__ == '__main__':
    main()
