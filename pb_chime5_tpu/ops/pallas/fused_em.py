"""Fused cacGMM E+M iteration as a Pallas TPU kernel.

One EM iteration reads the unit-normalized observations z once per
frequency/time tile and produces only the (K, D, D) scatter accumulators
and (K,) affiliation masses — the XLA formulation materializes ~1.2 GB of
(F, K, T, D) quadratic-form/weighted intermediates in HBM per iteration
for the 24-channel headline config.  The M-step's 1/denom factor is
algebraically deferred to after the kernel (same identity as
``cacgmm._fused_em_iteration``).

Complex arithmetic uses the real 2x2-block representation so each complex
matmul is ONE real dot with doubled contraction depth instead of four
thin ones — the MXU tiles D=24-deep contractions poorly, so halving the
dot count and doubling their depth measurably helps.

Mosaic constraints shaped the kernel (each was bisected on the axon
backend):

* everything stays 2-D inside the kernel — splitting the lane dimension
  with a (T, K*D) -> (T, K, D) reshape crashes the compiler, so
  group-over-K reductions/broadcasts are expressed as dots with a block
  one-hot matrix,
* in-kernel dots carry ``precision=HIGHEST`` (the Mosaic default is a
  single bf16 pass: measured 3e-3 relative error on the scatter),
* scatter accumulation across time tiles uses output-block revisiting
  (the t grid axis is innermost and maps to the same output block).

Reference workload: pb_chime5/core.py:171-206 (513 x 20-iteration EM).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_em_scatter']

_HIGHEST = jax.lax.Precision.HIGHEST

# Largest single time tile (sublane count of the in-kernel [zr|zi] block,
# ~4096 x 48 floats = 786 KB VMEM).  One tile per frequency measured
# ~0.5 ms/iteration faster than two on the headline T=2503 workload
# (fewer grid steps and no output-block revisiting).
_MAX_TIME_TILE = 4096


def resolve_time_tile(T, time_tile=None):
    """None -> one tile covering T (rounded up to a sublane multiple)
    when that fits VMEM, else fixed 2048-frame tiles."""
    if time_tile is not None:
        return time_tile
    tp8 = -(-T // 8) * 8
    return tp8 if tp8 <= _MAX_TIME_TILE else 2048


def _kernel(z2_ref, z2t_ref, pt2_ref, lw_ref, ld_ref, act_ref, fm_ref,
            s4_ref, den_ref, *, K, D):
    KD = K * D
    z2 = z2_ref[0]                             # (Tt, 2D) = [zr | zi]
    z2t = z2t_ref[0]                           # (2D, Tt) transposed copy
    pt2 = pt2_ref[0]                           # (2D, 2KD) real block rep
    lw, ld = lw_ref[0], ld_ref[0]              # (1, K)
    act = act_ref[...]                         # (Tt, K)
    fm = fm_ref[...]                           # (Tt, 1)
    tiny = jnp.float32(np.finfo(np.float32).tiny)

    def dot(a, b, contract):
        return jax.lax.dot_general(
            a, b, ((contract, (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST)

    # E-step: [vzr | vzi] = [zr zi] @ [[ptr, pti], [-pti, ptr]]
    vz2 = dot(z2, pt2, (1,))                   # (Tt, 2KD)
    zr = z2[:, :D]
    zi = z2[:, D:]
    ztr = jnp.concatenate([zr] * K, axis=1)    # (Tt, KD)
    zti = jnp.concatenate([zi] * K, axis=1)
    # q = sum_d Re(vz conj(z)): per-class group sum over the lane axis as
    # one dot with a block one-hot (2-D only — see module docstring)
    prod = vz2[:, :KD] * ztr + vz2[:, KD:] * zti
    kd = jax.lax.broadcasted_iota(jnp.int32, (KD, K), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (KD, K), 1)
    G = jnp.where(kd // D == kk, 1.0, 0.0)
    q = jnp.maximum(dot(prod, G, (1,)), tiny)  # (Tt, K)

    log_pdf = lw - D * jnp.log(q) - ld
    log_pdf = log_pdf - jnp.max(log_pdf, axis=1, keepdims=True)
    gamma = jnp.exp(log_pdf) * act
    gamma = gamma / jnp.maximum(jnp.sum(gamma, axis=1, keepdims=True),
                                tiny)
    gamma = gamma * fm                         # M-step frame mask

    # M-step accumulation: S_k += sum_t (gamma/q) z z^H.  One deep dot
    # produces all four real block products at once, computed TRANSPOSED
    #   S4^T = [zr zi]^T [wr wi]  (dim-1/dim-0 contraction with the
    # pre-transposed z2t on the left).  The mathematically identical
    # dim-0/dim-0 form dot(w2, z2) costs ~1.4 ms/iteration MORE at the
    # headline shape: Mosaic must transpose the (Tt, 2KD) operand
    # in-VMEM before the MXU, and the 6-pass HIGHEST decomposition
    # amplifies it — measured 4.0 vs 1.5 ms against an equal-FLOP
    # standard-form dot (scripts_dev/bench_em_scatter_form.py).
    coeff = gamma / q                          # (Tt, K)
    wc = dot(coeff, G.T, (1,))                 # (Tt, KD)
    w2 = jnp.concatenate([wc * ztr, wc * zti], axis=1)   # (Tt, 2KD)
    s4 = dot(z2t, w2, (1,))                    # (2D, 2KD) = S4^T
    den = jnp.sum(gamma, axis=0, keepdims=True)   # (1, K)

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        s4_ref[0] = s4
        den_ref[0] = den

    @pl.when(t > 0)
    def _():
        s4_ref[0] += s4
        den_ref[0] += den


@functools.partial(jax.jit,
                   static_argnames=('K', 'D', 'time_tile', 'interpret'))
def _scatter_call(z2, z2t, pt2, lw, ld, act, fm, *, K, D, time_tile,
                  interpret):
    F, T, _ = z2.shape
    KD = K * D
    nt = T // time_tile
    vmem = pltpu.VMEM
    s4, den = pl.pallas_call(
        functools.partial(_kernel, K=K, D=D),
        grid=(F, nt),
        in_specs=[
            pl.BlockSpec((1, time_tile, 2 * D), lambda f, t: (f, t, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 2 * D, time_tile), lambda f, t: (f, 0, t),
                         memory_space=vmem),
            pl.BlockSpec((1, 2 * D, 2 * KD), lambda f, t: (f, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, K), lambda f, t: (f, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, K), lambda f, t: (f, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((time_tile, K), lambda f, t: (t, 0),
                         memory_space=vmem),
            pl.BlockSpec((time_tile, 1), lambda f, t: (t, 0),
                         memory_space=vmem),
        ],
        out_specs=(
            pl.BlockSpec((1, 2 * D, 2 * KD), lambda f, t: (f, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 1, K), lambda f, t: (f, 0, 0),
                         memory_space=vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, 2 * D, 2 * KD), jnp.float32),
            jax.ShapeDtypeStruct((F, 1, K), jnp.float32),
        ),
        # The kernel's elementwise intermediates (vz2/prod/w2/... ~5.8 KB
        # per frame) put the scoped-VMEM stack at ~16 MB for the headline
        # single-tile T=2504 — under the default 16 MB limit standalone,
        # but OVER it when vmap (the batched/mesh dispatch paths) adds
        # its batch-index bookkeeping: measured 18.21 MB at B=4 (compile
        # OOM, round 5).  Raise the per-kernel cap to 32 MB (v5e has
        # 128 MB VMEM/core); same tile everywhere keeps batched output
        # rows bit-identical to the single-utterance program.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(z2, z2t, pt2, lw, ld, act, fm)
    return s4, den


def prepare_activity(source_activity_mask, T, K, *, time_tile=None):
    """(K, T) mask (or None = all-on) -> padded (Tp, K) kernel plane.
    Padded frames get 1.0 (they are excluded by the frame mask)."""
    pad = (-T) % resolve_time_tile(T, time_tile)
    if source_activity_mask is None:
        return jnp.ones((T + pad, K), jnp.float32)
    return jnp.pad(
        jnp.asarray(source_activity_mask, jnp.float32).T,
        ((0, pad), (0, 0)), constant_values=1.0)             # (Tp, K)


def prepare_em_inputs(z, source_activity_mask, frame_mask, K, *,
                      time_tile=None):
    """Hoist the per-EM-run-constant kernel inputs (the padded [zr | zi]
    planes — in BOTH layouts, see the scatter-dot note in :func:`_kernel`
    — and masks) out of the iteration loop.  Returns ``(zpack, act, fm)``
    with ``zpack = (z2 (F, Tp, 2D), z2t (F, 2D, Tp))``."""
    F, T, D = z.shape
    time_tile = resolve_time_tile(T, time_tile)
    pad = (-T) % time_tile
    zr = jnp.pad(z.real.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    zi = jnp.pad(z.imag.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    z2 = jnp.concatenate([zr, zi], axis=-1)                  # (F, Tp, 2D)
    z2t = jnp.transpose(z2, (0, 2, 1))                       # (F, 2D, Tp)
    fm = (jnp.ones((T,), jnp.float32) if frame_mask is None
          else jnp.asarray(frame_mask, jnp.float32))
    fm = jnp.pad(fm, (0, pad))[:, None]                      # (Tp, 1)
    act = prepare_activity(source_activity_mask, T, K,
                           time_tile=time_tile)
    return (z2, z2t), act, fm


def fused_em_scatter_prepared(zpack, act, fm, params, *, D,
                              time_tile=None, interpret=None):
    """One fused E+M accumulation pass over inputs from
    :func:`prepare_em_inputs` (same ``time_tile`` as used there: the
    padded length of z2 must be a multiple of it).  ``zpack`` is the
    ``(z2, z2t)`` layout pair returned by :func:`prepare_em_inputs`."""
    z2, z2t = zpack
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    if time_tile is None:
        # z2 is already padded to a tile multiple by prepare_em_inputs;
        # recover the same resolution from the padded length when it
        # divides evenly.  If prepare used a custom tile that the default
        # resolution does not divide, fall back to the largest divisor of
        # the padded length <= _MAX_TIME_TILE (NOT the whole length — a
        # single tile over a long utterance would exceed VMEM), preferring
        # sublane-aligned (multiple-of-8) divisors.
        tp = z2.shape[1]
        time_tile = resolve_time_tile(tp)
        if tp % time_tile:
            cap = min(tp, _MAX_TIME_TILE)
            time_tile = next(
                (t for t in range(cap - cap % 8, 0, -8) if tp % t == 0),
                None) or next(
                t for t in range(cap, 0, -1) if tp % t == 0)
    log_weight, precision, logdet = params
    F = z2.shape[0]
    K = log_weight.shape[-1]
    KD = K * D

    # PT[f, e, k*D + d] = precision[f, k, d, e]; real block rep
    pt = jnp.transpose(precision, (0, 3, 1, 2)).reshape(F, D, KD)
    ptr = pt.real.astype(jnp.float32)
    pti = pt.imag.astype(jnp.float32)
    pt2 = jnp.concatenate([
        jnp.concatenate([ptr, pti], axis=-1),
        jnp.concatenate([-pti, ptr], axis=-1),
    ], axis=-2)                                              # (F, 2D, 2KD)

    s4, den = _scatter_call(
        z2, z2t, pt2,
        jnp.asarray(log_weight, jnp.float32)[:, None, :],
        jnp.asarray(logdet, jnp.float32)[:, None, :],
        act, fm, K=K, D=D, time_tile=time_tile, interpret=interpret)
    # the kernel emits S4^T (F, 2D, 2KD); undo the real block rep in the
    # transposed layout, then one cheap XLA transpose back to (F, KD, D)
    sr = s4[:, :D, :KD] + s4[:, D:, KD:]
    si = s4[:, :D, KD:] - s4[:, D:, :KD]
    S = (jnp.transpose(sr + 1j * si, (0, 2, 1))
         .astype(jnp.complex64).reshape(F, K, D, D))
    return S, den[:, 0, :]


def fused_em_scatter(z, params, source_activity_mask, frame_mask, *,
                     time_tile=None, interpret=None):
    """One fused E+M accumulation pass.

    z (F, T, D) complex64, params = (log_weight (F, K), precision
    (F, K, D, D) complex, logdet (F, K)) -> (scatter S (F, K, D, D)
    complex64 — WITHOUT the 1/denom_k factor or the D scaling — and
    denom (F, K)).

    ``source_activity_mask`` (K, T) bool or None; ``frame_mask`` (T,) bool
    or None.  T is padded internally to a multiple of ``time_tile``
    (padded frames are masked out of the statistics).
    """
    K = params[0].shape[-1]
    D = z.shape[-1]
    z2, act, fm = prepare_em_inputs(
        z, source_activity_mask, frame_mask, K, time_tile=time_tile)
    return fused_em_scatter_prepared(
        z2, act, fm, params, D=D, time_tile=time_tile,
        interpret=interpret)
