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

The dot is written in STANDARD (dim-1/dim-0) form: the left operand is
the weighted stacked signal in its NATIVE row-major layout (2dim, Tt) —
exactly how ``build_y_tilde`` produces it, so it needs no transpose at
all — and only the right operand uses the time-major copy, which is
loop-constant across WPE iterations.  The first version of this kernel
contracted dim-0/dim-0 with both operands time-major; that both forced
an XLA transpose of the whole 2.5 GB stacked signal AND a hidden
per-tile Mosaic in-VMEM transpose amplified 6x by HIGHEST — the round-2
"net slower than XLA" verdict was this transpose tax, not the fusion
idea (same lesson as the fused-EM scatter dot, see
docs/ARCHITECTURE.md round-3 ledger).

The contraction depth is the time tile and the output is
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


def _kernel(ytt2_ref, b2_ref, w_ref, o_ref):
    ytt2 = ytt2_ref[0]                        # (2*dim, Tt) native layout
    b = b2_ref[0]                             # (Tt, 2*dim + 2*D) time-major
    w = w_ref[0]                              # (1, Tt)
    a = ytt2 * w                              # weighted copy, VMEM only
    o = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST)

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        o_ref[0] = o

    @pl.when(t > 0)
    def _():
        o_ref[0] += o


@functools.partial(jax.jit, static_argnames=('time_tile', 'interpret'))
def _stats_call(ytt2, b2, w, *, time_tile, interpret):
    F, dim2, T = ytt2.shape
    db2 = b2.shape[-1]
    nt = T // time_tile
    vmem = pltpu.VMEM
    return pl.pallas_call(
        _kernel,
        grid=(F, nt),
        in_specs=[
            pl.BlockSpec((1, dim2, time_tile), lambda f, t: (f, 0, t),
                         memory_space=vmem),
            pl.BlockSpec((1, time_tile, db2), lambda f, t: (f, t, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, time_tile), lambda f, t: (f, 0, t),
                         memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, dim2, db2),
                               lambda f, t: (f, 0, 0), memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((F, dim2, db2), jnp.float32),
        interpret=interpret,
    )(ytt2, b2, w)


def prepare_wpe_planes(Y_tilde, Y, *, time_tile=512):
    """Hoist the iteration-constant kernel inputs: the native-layout
    [Ytr; Yti] plane (a dtype view of the stacked signal — no transpose)
    and the time-major [Ytr | Yti | Yr | Yi] right operand (the one
    2.5 GB transpose, paid once per WPE run, not per iteration)."""
    F, dim, T = Y_tilde.shape
    pad = (-T) % time_tile

    ytt2 = jnp.concatenate(
        [Y_tilde.real.astype(jnp.float32),
         Y_tilde.imag.astype(jnp.float32)], axis=1)       # (F, 2dim, T)
    ytt2 = jnp.pad(ytt2, ((0, 0), (0, 0), (0, pad)))

    def planes(X):
        Xt = jnp.swapaxes(X, -2, -1)                      # (F, T, rows)
        Xt = jnp.pad(Xt, ((0, 0), (0, pad), (0, 0)))
        return jnp.concatenate(
            [Xt.real.astype(jnp.float32), Xt.imag.astype(jnp.float32)],
            axis=-1)

    b2 = jnp.concatenate([planes(Y_tilde), planes(Y)], axis=-1)
    return ytt2, b2, pad


def wpe_statistics_prepared(ytt2, b2, inv_power, dim, D, *,
                            time_tile=512, interpret=None):
    """R/P from planes built by :func:`prepare_wpe_planes`."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    Tp = ytt2.shape[-1]
    w = jnp.pad(inv_power.astype(jnp.float32),
                ((0, 0), (0, Tp - inv_power.shape[-1])))[:, None, :]
    o = _stats_call(ytt2, b2, w, time_tile=time_tile, interpret=interpret)

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


def wpe_statistics(Y_tilde, Y, inv_power, *, time_tile=512,
                   interpret=None):
    """R = sum_t w ytilde ytilde^H, P = sum_t w ytilde y^H — one fused
    pass.

    Y_tilde (F, dim, T) complex, Y (F, D, T) complex, inv_power (F, T)
    real -> (R (F, dim, dim), P (F, dim, D)) complex64.
    """
    F, dim, T = Y_tilde.shape
    D = Y.shape[1]
    ytt2, b2, _ = prepare_wpe_planes(Y_tilde, Y, time_tile=time_tile)
    return wpe_statistics_prepared(
        ytt2, b2, inv_power, dim, D,
        time_tile=time_tile, interpret=interpret)
