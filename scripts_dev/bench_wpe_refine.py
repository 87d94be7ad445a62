"""A/B: iterative refinement on the regularized WPE solve (VERDICT r3
next #5).

Replicates the stress lane's WPE parity leg EXACTLY (same scene as
tests/test_stress_headline.py::make_production_scene, same f64
unregularized NumPy oracle) and sweeps

    solve_refine in {0, 1, 2}  x  regularization in {1e-4, 1e-5, 1e-6}

printing the relative waveform-RMS deviation of the f32 production WPE
front vs the oracle, plus finiteness.  Hypothesis: one residual
correction (r = P - R G; G += solve(R + lambda I, r)) cancels the
first-order bias of the diagonal load, so the 9.63 % parity deviation —
previously attributed entirely to the load — collapses at the SAME
stable lambda=1e-4.

Run (CPU ok — parity is precision-, not platform-, bound):
    JAX_PLATFORMS=cpu python scripts_dev/bench_wpe_refine.py
"""

import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


def main():
    from tests import reference_numpy as ref
    from tests.test_stress_headline import make_production_scene
    from pb_chime5_tpu.models.gss import GssConfig, _stft_and_mask, \
        _wpe_stage

    size, shift = 1024, 256
    taps, delay, wpe_iters = 10, 2, 3
    rng = np.random.default_rng(0)
    obs, activity, spans = make_production_scene(rng)

    Obs = ref.stft_np(obs, size, shift, fading=True)
    Y_raw = np.ascontiguousarray(Obs.transpose(2, 0, 1))
    del Obs
    t0 = time.time()
    Y_o = ref.wpe_np(Y_raw, taps=taps, delay=delay, iterations=wpe_iters)
    print(f'# f64 oracle: {time.time() - t0:.1f}s', flush=True)

    def rel_rms(a, b):
        return float(np.linalg.norm(a - b) / np.linalg.norm(b))

    obs32 = jnp.asarray(obs, jnp.float32)
    for reg in (1e-4, 1e-5, 1e-6):
        for refine in (0, 1, 2):
            config = GssConfig(wpe_regularization=reg,
                               wpe_solve_refine=refine)

            @jax.jit
            def f(o, config=config):
                O, fm, _ = _stft_and_mask(o, None, config)
                Ow = _wpe_stage(O, config, fm)
                return Ow.real, Ow.imag

            t0 = time.time()
            yr, yi = f(obs32)
            Y_p = np.asarray(yr) + 1j * np.asarray(yi)
            wall = time.time() - t0
            finite = bool(np.isfinite(Y_p).all())
            dev = rel_rms(Y_p, Y_o) if finite else float('nan')
            print(f'reg={reg:g} refine={refine}: rel_rms={dev:.5f} '
                  f'finite={finite} wall={wall:.1f}s', flush=True)


if __name__ == '__main__':
    main()
