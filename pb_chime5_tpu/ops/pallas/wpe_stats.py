"""WPE correlation statistics as a Pallas TPU kernel.

Per iteration, WPE needs R = sum_t w_t ytilde_t ytilde_t^H (dim x dim,
dim = taps*D) and P = sum_t w_t ytilde_t y_t^H (dim x D).  The XLA
formulation writes the weighted (F, dim, T) copy of the stacked signal to
HBM and reads the stacked signal twice more for the two einsums; this
kernel reads the stacked signal once per time tile and computes BOTH
statistics with ONE deep real dot in the complex 2x2-block
representation:

    O = (w * [Ytr | Yti])^T @ [Ytr | Yti | Yr | Yi]      (2dim, 2dim+2D)

whose blocks assemble R and P exactly:

    R = O[r, r] + O[i, i] + 1j (O[i, r] - O[r, i])
    (and likewise for the P columns), since
    sum w (a + ib)(c - id) = (sum w ac + sum w bd) + 1j (sum w bc - ad).

The contraction depth is the time tile (512+) and the output is
(2dim, 2dim+2D) — MXU-friendly where the EM's D=24 contractions are not.
Accumulation across time tiles revisits the output block (t is the
innermost grid axis).  Strictly 2-D in-kernel; dots carry HIGHEST
precision (see ops/pallas/fused_em.py for the bisected Mosaic
constraints).

Reference workload: nara_wpe wpe_v8 statistics as driven by
pb_chime5/core.py:41-88.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['wpe_statistics']

_HIGHEST = jax.lax.Precision.HIGHEST


def _kernel(yt2_ref, y2_ref, w_ref, o_ref):
    yt2 = yt2_ref[0]                          # (Tt, 2*dim) = [Ytr | Yti]
    y2 = y2_ref[0]                            # (Tt, 2*D)   = [Yr | Yi]
    w = w_ref[0]                              # (Tt, 1)
    a = yt2 * w                               # weighted copy, VMEM only
    b = jnp.concatenate([yt2, y2], axis=1)    # (Tt, 2*dim + 2*D)
    o = jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST)

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        o_ref[0] = o

    @pl.when(t > 0)
    def _():
        o_ref[0] += o


@functools.partial(jax.jit, static_argnames=('time_tile', 'interpret'))
def _stats_call(yt2, y2, w, *, time_tile, interpret):
    F, T, dim2 = yt2.shape
    d2 = y2.shape[-1]
    nt = T // time_tile
    vmem = pltpu.VMEM
    return pl.pallas_call(
        _kernel,
        grid=(F, nt),
        in_specs=[
            pl.BlockSpec((1, time_tile, dim2), lambda f, t: (f, t, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, time_tile, d2), lambda f, t: (f, t, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, time_tile, 1), lambda f, t: (f, t, 0),
                         memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, dim2, dim2 + d2),
                               lambda f, t: (f, 0, 0), memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((F, dim2, dim2 + d2), jnp.float32),
        interpret=interpret,
    )(yt2, y2, w)


def wpe_statistics(Y_tilde, Y, inv_power, *, time_tile=512,
                   interpret=None):
    """R = sum_t w ytilde ytilde^H, P = sum_t w ytilde y^H — one fused
    pass.

    Y_tilde (F, dim, T) complex, Y (F, D, T) complex, inv_power (F, T)
    real -> (R (F, dim, dim), P (F, dim, D)) complex64.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    F, dim, T = Y_tilde.shape
    D = Y.shape[1]
    pad = (-T) % time_tile

    def planes(X):
        Xt = jnp.swapaxes(X, -2, -1).astype(jnp.complex64)   # (F, T, rows)
        Xt = jnp.pad(Xt, ((0, 0), (0, pad), (0, 0)))
        return jnp.concatenate(
            [Xt.real.astype(jnp.float32), Xt.imag.astype(jnp.float32)],
            axis=-1)

    yt2 = planes(Y_tilde)                                 # (F, Tp, 2dim)
    y2 = planes(Y)                                        # (F, Tp, 2D)
    w = jnp.pad(inv_power.astype(jnp.float32),
                ((0, 0), (0, pad)))[..., None]            # (F, Tp, 1)
    o = _stats_call(yt2, y2, w, time_tile=time_tile, interpret=interpret)

    rr = o[:, :dim, :dim]
    ii = o[:, dim:, dim:dim + dim]
    ir = o[:, dim:, :dim]
    ri = o[:, :dim, dim:dim + dim]
    R = (rr + ii + 1j * (ir - ri)).astype(jnp.complex64)
    pr_r = o[:, :dim, 2 * dim:2 * dim + D]
    pr_i = o[:, dim:, 2 * dim + D:]
    pi_r = o[:, dim:, 2 * dim:2 * dim + D]
    pi_i = o[:, :dim, 2 * dim + D:]
    P = (pr_r + pr_i + 1j * (pi_r - pi_i)).astype(jnp.complex64)
    return R, P
