"""Dev A/B: contraction form of the fused-EM scatter dot.

OUTCOME (landed): the M-step scatter S4 = w2^T z2 was written as a
dim-0/dim-0 ``dot_general`` (contract the sublane axis of both
operands).  At the headline shape ((Tt, 2KD) x (Tt, 2D), Tt = 2560,
HIGHEST precision) Mosaic must transpose an operand in-VMEM before the
MXU and the 6-pass f32 decomposition amplifies the cost: measured
~4.0 ms vs ~1.5 ms for the mathematically identical standard-form
(dim-1/dim-0) dot with a pre-transposed z2t block as the LEFT operand
(isolated kernels, deltas vs an empty-grid baseline, tunnel constant
subtracted).  The equal-FLOP E-step dot (already standard-form) costs
~0.7 ms.  Landing the standard form in ops/pallas/fused_em.py moved the
headline bench 84.3 -> 88.6x (~21 EM iterations x ~1 ms).

Run: python scripts_dev/bench_em_scatter_form.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')

_HIGHEST = jax.lax.Precision.HIGHEST
F, D, K = 513, 24, 5
KD = K * D
Tt = 2560


def make_kernel(mode):
    def _kernel(z2_ref, z2t_ref, pt2_ref, s4_ref):
        z2 = z2_ref[0]
        pt2 = pt2_ref[0]

        def dot(a, b, prec=_HIGHEST):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        if mode == 'empty':
            s4_ref[0] = jnp.zeros((2 * D, 2 * KD), jnp.float32) + z2[0, 0]
            return
        vz2 = dot(z2, pt2)                        # (Tt, 2KD) standard
        if mode == 'std':
            s4_ref[0] = dot(z2t_ref[0], vz2)      # (2D, 2KD) standard
        else:                                     # 'transposed' (old form)
            s4 = jax.lax.dot_general(
                vz2, z2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HIGHEST)
            s4_ref[0] = s4.T
    return _kernel


@functools.partial(jax.jit, static_argnames=('mode',))
def run(z2, z2t, pt2, mode):
    vmem = pltpu.VMEM
    s4 = pl.pallas_call(
        make_kernel(mode),
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, Tt, 2 * D), lambda f: (f, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 2 * D, Tt), lambda f: (f, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 2 * D, 2 * KD), lambda f: (f, 0, 0),
                         memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, 2 * D, 2 * KD), lambda f: (f, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((F, 2 * D, 2 * KD), jnp.float32),
    )(z2, z2t, pt2)
    return jnp.sum(jnp.abs(s4))


def main():
    rng = np.random.default_rng(0)
    z2 = rng.standard_normal((F, Tt, 2 * D)).astype(np.float32)
    z2t = np.ascontiguousarray(z2.transpose(0, 2, 1))
    pt2 = rng.standard_normal((F, 2 * D, 2 * KD)).astype(np.float32)
    z2d, z2td, pt2d = map(jax.device_put, (z2, z2t, pt2))

    ref = None
    for mode in ['empty', 'transposed', 'std', 'transposed', 'std']:
        out = run(z2d, z2td, pt2d, mode)
        v = float(np.asarray(out.reshape(1))[0])
        if mode != 'empty':
            ref = v if ref is None else ref
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            out = run(z2d, z2td, pt2d, mode)
            _ = float(np.asarray(out.reshape(1))[0])
            ts.append(time.perf_counter() - t0)
        dev = 0.0 if ref is None or mode == 'empty' \
            else abs(v - ref) / abs(ref)
        print(f'{mode:10s}: min {min(ts)*1e3:6.2f} ms  '
              f'med {sorted(ts)[4]*1e3:6.2f} ms  rel_dev {dev:.2e}')


if __name__ == '__main__':
    main()
