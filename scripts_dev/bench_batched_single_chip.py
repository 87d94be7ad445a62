"""Single-chip batched-dispatch A/B (VERDICT r4 weak #6 / next #4).

Question: does collating B same-bucket utterances into ONE
``batched_gss_enhance`` program beat B back-to-back single-utterance
programs on one chip?  The hypothesis: the overhead-bound stages (the
240-dim WPE solve at tiny tile occupancy, the small EM matrices) gain
MXU occupancy when vmapped across the batch.

Headline workload (bench.py): 40 s observation, D=24, K=5, WPE 10 taps
x 3 iters, cacGMM 20+1, MVDR+BAN.  B>1 rows each materialize the
(F, taps*D, T) stacked WPE signal (~2.6 GB), so batched variants run
with wpe_chunk_size bounding scratch to one (F, taps*D, chunk) block
per row; B=1 is measured BOTH unchunked (the shipping headline) and
chunked (apples-to-apples with the batched program).

Run on the chip:  python scripts_dev/bench_batched_single_chip.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from pb_chime5_tpu.models.gss import GssConfig, gss_enhance
from pb_chime5_tpu.parallel.mesh import batched_gss_enhance
from pb_chime5_tpu.utils import activity_time_to_frequency

CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 512

fs = 16000
seconds = 40.0
N = int(seconds * fs)
D, K = 24, 5

rng = np.random.default_rng(0)
envelope = np.abs(rng.standard_normal(N // 800 + 1)).repeat(800)[:N]
obs = (rng.standard_normal((D, N)) * envelope * 0.1).astype(np.float32)
activity = np.zeros((K, N), bool)
for k in range(K - 1):
    activity[k, rng.integers(0, N // 2):rng.integers(N // 2, N)] = True
activity[-1] = True

cfg0 = GssConfig()
act_f = activity_time_to_frequency(
    activity, cfg0.stft_size, cfg0.stft_shift,
    stft_fading=cfg0.stft_fading, stft_pad=True).astype(np.int8)
ctx = 937

checksum = jax.jit(lambda v: jnp.sum(jnp.abs(v)).reshape(1))


def force(x):
    return np.asarray(checksum(x))     # download closes the timing


def time_single(config, groups=3, depth=4):
    args = (jnp.asarray(obs), jnp.asarray(act_f), jnp.int32(0))
    kw = dict(config=config, start_context_frames=jnp.int32(ctx),
              end_context_frames=jnp.int32(ctx))
    x, _ = gss_enhance(*args, **kw)
    xh = np.asarray(x)
    assert np.isfinite(xh).all() and np.abs(xh).max() > 0
    force(x)
    walls = []
    for _ in range(groups):
        t0 = time.perf_counter()
        acc = []
        for _ in range(depth):
            x, _ = gss_enhance(*args, **kw)
            acc.append(checksum(x))
        np.asarray(jnp.concatenate(acc).sum().reshape(1))
        walls.append((time.perf_counter() - t0) / depth)
    return sorted(walls)[len(walls) // 2], xh


def time_batched(config, B, groups=3, depth=4):
    obs_b = jnp.asarray(np.broadcast_to(obs, (B, D, N)))
    act_b = jnp.asarray(np.broadcast_to(act_f, (B,) + act_f.shape))
    tgt = jnp.zeros((B,), jnp.int32)
    valid = jnp.full((B,), N, jnp.int32)
    scf = jnp.full((B,), ctx, jnp.int32)
    kw = dict(config=config, num_output_samples=N)
    x = batched_gss_enhance(obs_b, act_b, tgt, valid,
                            start_context_frames=scf,
                            end_context_frames=scf, **kw)
    xh = np.asarray(x)
    assert np.isfinite(xh).all() and np.abs(xh).max() > 0
    force(x)
    walls = []
    for _ in range(groups):
        t0 = time.perf_counter()
        acc = []
        for _ in range(depth):
            x = batched_gss_enhance(obs_b, act_b, tgt, valid,
                                    start_context_frames=scf,
                                    end_context_frames=scf, **kw)
            acc.append(checksum(x))
        np.asarray(jnp.concatenate(acc).sum().reshape(1))
        walls.append((time.perf_counter() - t0) / (depth * B))
    return sorted(walls)[len(walls) // 2], xh


print(f'device: {jax.devices()[0]}  chunk={CHUNK}', flush=True)

wall_1u, x1u = time_single(cfg0)
print(f'single unchunked (headline): {wall_1u*1e3:8.1f} ms/utt '
      f'-> {seconds/wall_1u:6.1f}x RT', flush=True)

cfg_c = GssConfig(wpe_chunk_size=CHUNK)
wall_1c, x1c = time_single(cfg_c)
print(f'single chunked({CHUNK}):        {wall_1c*1e3:8.1f} ms/utt '
      f'-> {seconds/wall_1c:6.1f}x RT', flush=True)

rows = {}
for B in (1, 2, 4):
    wall, xb = time_batched(cfg_c, B)
    rows[B] = xb
    print(f'batched B={B} chunked({CHUNK}):   {wall*1e3:8.1f} ms/utt '
          f'-> {seconds/wall:6.1f}x RT', flush=True)

# determinism of batching itself: identical input rows within ONE
# program must produce bitwise-identical output rows (measured True on
# TPU, round 5).  Rows across DIFFERENT programs (B=2 vs B=1) differ at
# the 2e-2 level: a different B is a different XLA program with
# different reduction blocking, and the trajectory-chaotic EM amplifies
# rounding (the same mechanism as the round-5 realistic-scene root
# cause, tests/test_realistic_scene.py) — informational, not a defect.
for B in (2, 4):
    within = all(np.array_equal(rows[B][0], rows[B][i])
                 for i in range(1, B))
    cross = float(np.abs(rows[B] - rows[1][0]).max())
    print(f'B={B}: within-program rows byte-identical={within}; '
          f'vs the B=1 program max abs diff {cross:.3e}', flush=True)
print('batched B=1 vs single chunked: max abs diff',
      float(np.abs(rows[1][0] - x1c).max()), flush=True)

# Measured on TPU v5e (round 5, chunk=512):
#   single unchunked (headline):  431.7 ms/utt -> 92.7x RT
#   single chunked(512):          481.2 ms/utt -> 83.1x RT
#   batched B=1 chunked(512):     500.2 ms/utt -> 80.0x RT
#   batched B=2 chunked(512):     499.0 ms/utt -> 80.2x RT
#   batched B=4 chunked(512):     513.8 ms/utt -> 77.9x RT
# DEAD END: per-utterance wall is FLAT in B — at 40 s observations the
# stages are throughput-bound, not dispatch-bound, so vmapping buys no
# MXU occupancy while the WPE chunking that bounds the batched (F,
# taps*D, T) scratch costs ~11% vs the unchunked headline.  Keep the
# serial one-utterance-per-program loop on single chips; batching stays
# what it is on the mesh path — a per-DEVICE packing knob, not a
# throughput optimization.  (Enabling this measurement required the
# 32 MB scoped-VMEM cap on the fused EM kernel: vmap's batch
# bookkeeping pushed the kernel's 16 MB scoped stack to 18.21 MB —
# compile OOM — at ANY B; see ops/pallas/fused_em.py.)
