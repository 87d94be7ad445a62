"""In-VMEM blocked Cholesky solve for the WPE filter system (Pallas TPU).

The WPE iteration solves ``R G = P`` with R (F=513, taps*D=240, 240)
Hermitian PD and P (F, 240, D=24) per iteration (reference semantics:
SURVEY.md section 2.9, nara_wpe ``wpe_v8``).  The XLA formulation
(ops/linalg.py::_cholesky_panels + _solve_from_panels) is correct and
backward-stable but *overhead-bound*: its ~8 panel factorizations and
2 x 8 substitution block-steps are dozens of small XLA ops at ~65 us
runtime overhead each on this backend — ~24 ms per iteration where the
arithmetic is worth ~2 ms (docs/ARCHITECTURE.md, round-2 ledger).

Here the whole factor-and-solve runs as ONE kernel, one frequency per
grid step, entirely in VMEM:

* the complex Hermitian system is lowered to its REAL block
  representation  M2 = [[Ar, -Ai], [Ai, Ar]]  (SPD, 480x480 -> padded
  512x512), so the kernel is pure float32 with no complex pairs;
* blocked right-looking Cholesky, 16 panels of 32: the diagonal block
  is factorized by a 32-step ``fori_loop`` that also builds inv(L11)
  AND its transpose row/column-wise (transposes are a bisected Mosaic
  crash trigger on this backend — see gj_inverse2d.py — so both
  orientations are maintained explicitly, and the symmetric input
  provides A12 = A21^T for a transpose-free L21^T = inv(L11) @ A12);
* panel updates, forward and backward substitution are static-offset
  reads/writes on VMEM scratch buffers (T: trailing matrix, L: column
  panels, U: L^T row panels, YI/YT: 32-row inverse blocks) — no
  dynamic slicing, no gathers;
* per-sublane index planes are (32, 1)/(1, 32) ``broadcasted_iota``
  masks; single-lane slices (another bisected trigger) never occur.

Numerics match the XLA path: same equilibration and diagonal load are
applied by the caller, the factorization is plain unpivoted Cholesky on
the loaded SPD matrix (pivots floored at tiny).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['chol_solve_real_spd', 'hermitian_solve_pallas']

_HIGHEST = jax.lax.Precision.HIGHEST
_BLOCK = 32


def _kernel(a_ref, b_ref, x_ref, t_ref, l_ref, u_ref, yi_ref, yt_ref,
            y_ref, *, S, EL):
    f32 = jnp.float32
    tiny = jnp.finfo(f32).tiny
    NB = S // _BLOCK

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_HIGHEST)

    r1 = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, 1), 0)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
           ).astype(f32)

    def factor32(P0):
        """32-step in-VMEM Cholesky of a (32, 32) SPD block; returns
        (L11 lower, inv(L11), inv(L11)^T) — the inverse rows/columns are
        built inside the same loop (ops/linalg.py::factor_panel logic,
        with the transpose maintained explicitly instead of taken)."""

        def step(p, carry):
            P, Inv, InvT = carry
            ec = (c1 == p).astype(f32)                       # (1, 32)
            er = (r1 == p).astype(f32)                       # (32, 1)
            col = jnp.sum(P * ec, axis=1, keepdims=True)     # (32, 1)
            piv = jnp.sum(col * er, axis=0, keepdims=True)   # (1, 1)
            rpiv = jnp.sqrt(jnp.maximum(piv, tiny))
            # rows above the pivot hold already-eliminated values: mask
            # them out so they cannot feed back (see factor_panel)
            lcol = jnp.where(r1 >= p, col, 0.0) / rpiv       # (32, 1)
            # transpose-free row view: sum(lcol * I) over rows
            lcolT = jnp.sum(lcol * eye, axis=0, keepdims=True)  # (1, 32)
            after = (c1 > p).astype(f32)
            P = P - lcol * (lcolT * after)
            P = P * (1.0 - ec) + lcol * ec                   # write col p
            # triangular-inverse row p: (e_p - L[p, :p] @ Inv) / l_pp
            lrow = jnp.sum(P * er, axis=0, keepdims=True) \
                * (c1 < p).astype(f32)                       # (1, 32)
            inv_row = (ec - dot(lrow, Inv)) / rpiv           # (1, 32)
            Inv = Inv * (1.0 - er) + er * inv_row
            inv_rowT = jnp.sum(inv_row * eye, axis=1,
                               keepdims=True)                # (32, 1)
            InvT = InvT * (1.0 - ec) + inv_rowT * ec
            return P, Inv, InvT

        z = jnp.zeros((_BLOCK, _BLOCK), f32)
        P, Inv, InvT = jax.lax.fori_loop(0, _BLOCK, step, (P0, z, z))
        P = jnp.where(r1 >= c1, P, 0.0)
        Inv = jnp.where(r1 >= c1, Inv, 0.0)
        InvT = jnp.where(r1 <= c1, InvT, 0.0)
        return P, Inv, InvT

    # ---- factorization ----
    t_ref[...] = a_ref[0]
    for j in range(NB):
        c0 = j * _BLOCK
        L11, Inv, InvT = factor32(t_ref[c0:c0 + _BLOCK, c0:c0 + _BLOCK])
        l_ref[c0:c0 + _BLOCK, c0:c0 + _BLOCK] = L11
        yi_ref[c0:c0 + _BLOCK, :] = Inv
        yt_ref[c0:c0 + _BLOCK, :] = InvT
        if j < NB - 1:
            A21 = t_ref[c0 + _BLOCK:, c0:c0 + _BLOCK]
            A12 = t_ref[c0:c0 + _BLOCK, c0 + _BLOCK:]
            L21 = dot(A21, InvT)                  # (S-c0-32, 32)
            L21T = dot(Inv, A12)                  # (32, S-c0-32)
            l_ref[c0 + _BLOCK:, c0:c0 + _BLOCK] = L21
            u_ref[c0:c0 + _BLOCK, c0 + _BLOCK:] = L21T
            t_ref[c0 + _BLOCK:, c0 + _BLOCK:] = (
                t_ref[c0 + _BLOCK:, c0 + _BLOCK:] - dot(L21, L21T))

    # ---- forward substitution: L Y = B ----
    y_ref[...] = b_ref[0]
    for j in range(NB):
        c0 = j * _BLOCK
        yj = dot(yi_ref[c0:c0 + _BLOCK, :], y_ref[c0:c0 + _BLOCK, :])
        y_ref[c0:c0 + _BLOCK, :] = yj
        if j < NB - 1:
            y_ref[c0 + _BLOCK:, :] = (
                y_ref[c0 + _BLOCK:, :]
                - dot(l_ref[c0 + _BLOCK:, c0:c0 + _BLOCK], yj))

    # ---- backward substitution: L^T X = Y ----
    for j in range(NB - 1, -1, -1):
        c0 = j * _BLOCK
        xj = dot(yt_ref[c0:c0 + _BLOCK, :], y_ref[c0:c0 + _BLOCK, :])
        x_ref[0, c0:c0 + _BLOCK, :] = xj
        if j > 0:
            y_ref[:c0, :] = (
                y_ref[:c0, :] - dot(u_ref[:c0, c0:c0 + _BLOCK], xj))


def chol_solve_real_spd(A2, B2, *, interpret=None):
    """Batched real SPD solve ``A2 X = B2`` in one in-VMEM kernel per
    batch element.

    A2 (F, S, S) float32 SPD with S % 32 == 0 (the caller pads; padding
    rows/cols must carry an uncoupled identity block), B2 (F, S, E) ->
    X (F, S, E).  E is padded to a lane multiple internally.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    F, S, _ = A2.shape
    E = B2.shape[-1]
    assert S % _BLOCK == 0, S
    EL = -(-E // 128) * 128
    if EL != E:
        B2 = jnp.pad(B2, ((0, 0), (0, 0), (0, EL - E)))

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, EL=EL),
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, S, S), lambda f: (f, 0, 0)),
            pl.BlockSpec((1, S, EL), lambda f: (f, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, EL), lambda f: (f, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, S, EL), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, S), jnp.float32),        # trailing matrix
            pltpu.VMEM((S, S), jnp.float32),        # L column panels
            pltpu.VMEM((S, S), jnp.float32),        # L^T row panels
            pltpu.VMEM((S, _BLOCK), jnp.float32),   # inv(L11) blocks
            pltpu.VMEM((S, _BLOCK), jnp.float32),   # inv(L11)^T blocks
            pltpu.VMEM((S, EL), jnp.float32),       # substitution buffer
        ],
        interpret=interpret,
    )(A2.astype(jnp.float32), B2.astype(jnp.float32))
    return out[..., :E]


def hermitian_solve_pallas(A, B, *, relative_load=None, interpret=None):
    """Drop-in for ops.linalg.hermitian_solve on complex HPD batches:
    same equilibration and diagonal load, factor+solve in the in-VMEM
    kernel via the real block representation.

    A (F, D, D) complex, B (F, D, E) complex -> X (F, D, E) complex.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    F, D, _ = A.shape
    E = B.shape[-1]
    rdtype = A.real.dtype
    if relative_load is None:
        relative_load = 64 * jnp.finfo(rdtype).eps

    # equilibration identical to hermitian_solve (ops/linalg.py)
    diag = jnp.diagonal(A, axis1=-2, axis2=-1).real
    maxdiag = jnp.max(diag, axis=-1, keepdims=True)
    floor = jnp.where(maxdiag > 0, maxdiag * jnp.finfo(rdtype).eps, 1.0)
    s = jnp.sqrt(jnp.maximum(diag, floor))
    sinv = 1.0 / s
    As = A * (sinv[..., :, None] * sinv[..., None, :]).astype(A.dtype)
    As = (As + As.conj().swapaxes(-2, -1)) * 0.5
    As = As + jnp.asarray(relative_load, A.dtype) * jnp.eye(D, dtype=A.dtype)
    Bs = B * sinv[..., :, None].astype(B.dtype)

    # real block representation, padded to a 32 multiple with identity
    S0 = 2 * D
    S = -(-S0 // _BLOCK) * _BLOCK
    Ar, Ai = As.real.astype(jnp.float32), As.imag.astype(jnp.float32)
    A2 = jnp.concatenate([
        jnp.concatenate([Ar, -Ai], axis=-1),
        jnp.concatenate([Ai, Ar], axis=-1),
    ], axis=-2)
    if S != S0:
        pad = S - S0
        A2 = jnp.concatenate([
            jnp.concatenate(
                [A2, jnp.zeros((F, S0, pad), jnp.float32)], axis=-1),
            jnp.concatenate(
                [jnp.zeros((F, pad, S0), jnp.float32),
                 jnp.broadcast_to(jnp.eye(pad, dtype=jnp.float32),
                                  (F, pad, pad))], axis=-1),
        ], axis=-2)
    B2 = jnp.concatenate([Bs.real.astype(jnp.float32),
                          Bs.imag.astype(jnp.float32)], axis=-2)
    if S != S0:
        B2 = jnp.pad(B2, ((0, 0), (0, S - S0), (0, 0)))

    X2 = chol_solve_real_spd(A2, B2, interpret=interpret)
    X = (X2[:, :D, :] + 1j * X2[:, D:S0, :]).astype(A.dtype)
    return X * sinv[..., :, None].astype(A.dtype)
