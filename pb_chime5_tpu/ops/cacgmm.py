"""Complex angular-central-Gaussian mixture model EM — the "GSS" core.

TPU-native rebuild of the capability of pb_bss.distribution.CACGMMTrainer as
driven by the reference GSS block (pb_chime5/core.py:144-214):

* observations are unit-normalized channel vectors z = y / ||y|| in C^D,
* class k has an ACG density  p(z | B_k) ∝ |B_k|^{-1} (z^H B_k^{-1} z)^{-D},
* E-step:  gamma_kt ∝ alpha_k |B_k|^{-1} q_kt^{-D}, zeroed outside the
  ``source_activity_mask``, renormalized over k,
* M-step:  B_k = D * sum_t (gamma_kt / q_kt) z_t z_t^H / sum_t gamma_kt,
  with Hermitian symmetrization and eigenvalue/diagonal flooring for
  conditioning (the ACG density is invariant to scaling of B, so the exact
  conditioning scheme only affects numerics, not the model),
* mixture weights are time-constant per class, alpha_k ∝ sum_t gamma_kt.

Iteration structure mirrors the reference exactly
(pb_chime5/core.py:180-202 together with the pb_bss fit loop):
``fit(initialization=affiliations, iterations=I)`` performs
M, (E, M) x (I - 1); afterwards

* ``iterations_post == 0``: one masked E-step produces the posterior,
* ``iterations_post == 1``: one *unmasked* E-step produces the posterior,
* ``iterations_post > 1``: (E_unmasked, M) x (post - 1), then one unmasked
  E-step.

The init floor (activity == 0 -> 1e-10, normalized over classes,
pb_chime5/core.py:156-160) is applied inside ``make_initialization``.

The reference loops the 513 frequency bins in Python
(pb_chime5/core.py:171-206); here the per-frequency EM is ``vmap``-ed over
the frequency axis so all bins advance in lockstep as batched matmuls on
the MXU.  A ``frame_mask`` argument supports padded (ragged-length)
utterance batches: padded frames contribute zero weight to the M-step
statistics.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from pb_chime5_tpu.ops.linalg import (
    hermitize, schur_inverse_and_logdet, gauss_jordan_inverse_and_logdet)

# float32 MXU precision for scatter matrices and quadratic forms (the
# TPU's default bf16 matmul inputs break the EM's conditioning).
_HIGHEST = jax.lax.Precision.HIGHEST

__all__ = ['CacgmmConfig', 'cacgmm_posteriors', 'cacgmm_posteriors_debug',
           'make_initialization']

_INIT_FLOOR = 1e-10


@dataclasses.dataclass(frozen=True)
class CacgmmConfig:
    """Static EM configuration (hashable -> usable as a jit static arg)."""
    iterations: int = 20
    iterations_post: int = 1
    # 'auto' = 'gauss_jordan' (matmul/elementwise-only XLA, required on
    # backends without linalg custom calls; also the measured-fastest
    # batched (F, K, 24, 24) inverse on v5e at ~2 ms) | 'pallas_gj'
    # (in-VMEM Pallas Gauss-Jordan, ops/pallas/gj_inverse2d.py —
    # compiles and matches to 5e-7 but measured ~1 ms/inversion SLOWER
    # in the EM loop: its per-pivot one-hot selection dots cost more
    # than the XLA path's HBM rewrites at D=24; kept as the working
    # exemplar of the in-VMEM factorization pattern) | 'cholesky' |
    # 'schur' | 'eigh'
    inverse: str = 'auto'
    eigenvalue_floor: float = 1e-10  # used by the 'eigh' inverse
    diagonal_floor: float = 1e-6     # 'gauss_jordan' / 'cholesky' / 'schur'
    # T-chunked fused E+M accumulation (lax.scan): the (K, T, D)
    # quadratic-form intermediates are never materialized in HBM — per
    # chunk they live in VMEM and only the (K, D, D) scatter accumulators
    # survive.  None = unfused (materializes ~1.2 GB of intermediates per
    # EM iteration for the 24-channel headline config).  The M-step
    # denominator division is algebraically deferred to after the scan,
    # so results match the unfused path to float rounding.
    em_chunk_size: int = None
    # 'auto' (fused E+M Pallas kernel on TPU — 20% faster, see
    # ops/pallas/fused_em.py — and batched XLA einsums elsewhere) |
    # 'xla' | 'pallas' (forced; interpret mode off-TPU)
    em_backend: str = 'auto'


def make_initialization(activity, dtype=jnp.float32):
    """Activity (K, T) {0,1} -> initial affiliations (K, T).

    Zeros are floored to 1e-10 and columns renormalized over classes,
    matching pb_chime5/core.py:156-160.
    """
    init = jnp.asarray(activity, dtype=dtype)
    init = jnp.where(init == 0, jnp.asarray(_INIT_FLOOR, dtype), init)
    return init / jnp.sum(init, axis=0, keepdims=True)


def _normalize_observations(y):
    """y (T, D) -> unit-norm rows z (T, D).

    All-zero rows (bucket-padding frames, digital silence) map to exact
    zeros through a select: ``0 / max(0, tiny)`` is 0 in honest
    arithmetic, but a fused fast-reciprocal of ``tiny`` can overflow to
    inf and turn it into 0 * inf = NaN (the round-3 fusion-NaN class —
    see docs/ARCHITECTURE.md)."""
    norm = jnp.linalg.norm(y, axis=-1, keepdims=True)
    tiny = jnp.finfo(norm.dtype).tiny
    return jnp.where(norm > tiny, y / jnp.maximum(norm, tiny),
                     jnp.zeros((), y.dtype))


def _trace_normalize(cov):
    """Scale each class covariance to trace == D (the reference's pb_bss
    conditioning, SURVEY.md section 2.9: 'trace-normalized for
    conditioning').

    The CACG density is scale-invariant in B (|cB|^-1 (z^H (cB)^-1 z)^-D
    == |B|^-1 (z^H B^-1 z)^-D), so posteriors are mathematically
    unchanged — but pinning trace(B) = D bounds the quadratic form
    q = z^H B^-1 z >= ||z||^2 / lambda_max(B) >= 1/D, which kills a real
    float32 failure mode: without it, an unlucky frequency can enter a
    q-underflow -> coefficient-overflow feedback (B's scale grows each
    M-step, q shrinks, 1/q explodes) that turns the whole bin NaN
    (found on-chip in round 3).

    A class with (numerically) ZERO scatter — a speaker silent in the
    whole utterance window, so gamma == 0 everywhere — gets B = I
    instead of 0: by the same scale invariance, B = c*I yields identical
    posteriors for ANY c, and the identity keeps the class's precision
    and logdet O(1) instead of at the float32 overflow edge
    (tiny*I -> precision 8.5e37, logdet -349), which measurably NaN'd
    under some XLA fusions.  NaN traces propagate (the zero test is
    False for NaN), so this never masks an upstream error."""
    D = cov.shape[-1]
    rdtype = cov.real.dtype
    tr = jnp.trace(cov, axis1=-2, axis2=-1).real[..., None, None] / D
    is_zero = tr <= jnp.finfo(rdtype).tiny
    eye = jnp.eye(D, dtype=cov.dtype)
    return jnp.where(
        is_zero, eye,
        cov / jnp.where(is_zero, jnp.ones_like(tr), tr).astype(cov.dtype))


def _m_step(z, gamma, quadratic_form, frame_mask, config):
    """One M-step for a single frequency.

    z (T, D) complex, gamma (K, T), quadratic_form (K, T) ->
    params pytree (log_weight (K,), precision (K, D, D), logdet (K,)).
    """
    rdtype = gamma.dtype
    tiny = jnp.finfo(rdtype).tiny
    D = z.shape[-1]

    if frame_mask is not None:
        gamma = gamma * frame_mask[None, :].astype(rdtype)

    denom = jnp.sum(gamma, axis=-1)                       # (K,)
    total = jnp.sum(denom)
    weight = jnp.where(total > 0, denom / jnp.maximum(total, tiny),
                       jnp.zeros((), rdtype))
    log_weight = jnp.log(jnp.maximum(weight, tiny))

    # B_k = D * sum_t coeff_kt z_t z_t^H  with
    # coeff_kt = gamma_kt / (denom_k * q_kt).  One explicit division with a
    # single floor: a class with zero total affiliation (denom == 0 ->
    # gamma == 0 everywhere) yields 0 / tiny = 0 instead of NaN.  (A chained
    # ``a / max(b, tiny) / max(c, tiny)`` is unsafe: XLA fuses it into a
    # reciprocal of the product and tiny * tiny underflows to 0.)
    # The outer where() pins coeff to EXACTLY 0 wherever gamma == 0,
    # whatever XLA turns the division into: measured on CPU, some fusions
    # of this expression produced NaN for an all-zero class (0 * inf from
    # a rearranged reciprocal) even though the written form cannot —
    # a select is the only fusion-proof guard (round 3, empty-class NaN).
    coeff = jnp.where(
        gamma > 0,
        gamma / jnp.maximum(denom[:, None] * quadratic_form, tiny),
        jnp.zeros((), rdtype))                             # (K, T) real
    # One batched matmul over the class axis (the transient (K, T, D)
    # weighted copy of z is cheap; keeping K inside the graph instead of a
    # Python loop cuts XLA compile time by an order of magnitude).
    weighted = z[None, :, :] * coeff[:, :, None].astype(z.dtype)  # (K,T,D)
    scatter = jnp.einsum('ktd,te->kde', weighted, z.conj(),
                         precision=_HIGHEST)               # (K, D, D)
    cov = _trace_normalize(hermitize(scatter * D))
    precision, logdet = _invert(cov, config)
    return log_weight, precision, logdet.astype(rdtype)


def _invert(cov, config, *, batched=False):
    """Hermitian (..., D, D) -> (precision, logdet), batched, with a
    conditioning floor.

    ``batched=True`` marks call sites that pass the FULL (F, K) batch in
    one call (the fused-EM driver).  Only those may use the Pallas
    in-VMEM kernel: under a per-frequency ``vmap`` the kernel's batch
    padding multiplies by F and its VMEM scratch exceeds the chip limit,
    so vmapped call sites silently use the XLA path instead (same math)."""
    D = cov.shape[-1]
    rdtype = cov.real.dtype
    tiny = jnp.finfo(rdtype).tiny
    if config.inverse == 'eigh':
        # pb_bss-faithful: eigenvalue floor relative to the largest
        # eigenvalue; logdet from the floored eigenvalues.
        ew, ev = jnp.linalg.eigh(cov)
        ew = ew.real
        floor = jnp.max(ew, axis=-1, keepdims=True) * config.eigenvalue_floor
        # Second clamp keeps an all-zero covariance (silent input) finite.
        ew = jnp.maximum(jnp.maximum(ew, floor), tiny)
        precision = jnp.matmul(
            ev * (1.0 / ew)[..., None, :].astype(ev.dtype),
            ev.conj().swapaxes(-2, -1), precision=_HIGHEST)
        logdet = jnp.sum(jnp.log(ew), axis=-1)
        return precision, logdet
    elif config.inverse == 'schur':
        # Recursive Schur-complement inverse — batched matmuls only.
        # Measured on v5e: NOT faster than the cholesky path (the deep
        # chain of small matmuls costs as much as the custom call), and
        # in float32 the explicit-inverse recursion loses positive
        # definiteness on the EM's extremely ill-conditioned converged
        # covariances.  Kept as an option for float64 / research use.
        tr = jnp.trace(cov, axis1=-2, axis2=-1).real
        jitter = jnp.maximum(config.diagonal_floor * tr / D, tiny)
        cov = cov + jitter[..., None, None].astype(cov.dtype) \
            * jnp.eye(D, dtype=cov.dtype)
        return schur_inverse_and_logdet(cov)
    elif config.inverse in ('auto', 'gauss_jordan', 'pallas_gj'):
        # Default: trace-scaled diagonal jitter (same conditioning as the
        # 'cholesky' mode), then a batched unpivoted Gauss-Jordan inverse.
        # Two reasons over XLA's cholesky+triangular-solve custom calls:
        # the axon TPU backend compiles no linalg custom calls at all, and
        # the D fused rank-1 pivot steps vectorize across the full
        # (F, K) batch where the factorizations serialize (measured faster
        # on-chip; see docs/ARCHITECTURE.md performance ledger).
        tr = jnp.trace(cov, axis1=-2, axis2=-1).real
        jitter = jnp.maximum(config.diagonal_floor * tr / D, tiny)
        cov = cov + jitter[..., None, None].astype(cov.dtype) \
            * jnp.eye(D, dtype=cov.dtype)
        mode = config.inverse
        if mode == 'auto':
            mode = 'gauss_jordan'
        if not batched:
            mode = 'gauss_jordan'
        if mode == 'pallas_gj':
            # in-VMEM pivot steps: one HBM read + write of the batch
            # instead of one rewrite per pivot step
            from pb_chime5_tpu.ops.pallas.gj_inverse2d import (
                hermitian_inverse_and_logdet_2d)
            return hermitian_inverse_and_logdet_2d(cov)
        return gauss_jordan_inverse_and_logdet(cov)
    elif config.inverse == 'cholesky':
        # Fast path: trace-scaled diagonal jitter, Cholesky inverse.
        tr = jnp.trace(cov, axis1=-2, axis2=-1).real
        # Clamp the jitter itself (not just the scale) so an all-zero
        # covariance (silent input) still factorizes instead of NaN-ing:
        # diagonal_floor * tiny underflows to 0 in float32.
        jitter = jnp.maximum(config.diagonal_floor * tr / D, tiny)
        cov = cov + jitter[..., None, None].astype(cov.dtype) \
            * jnp.eye(D, dtype=cov.dtype)
        L = jnp.linalg.cholesky(cov)
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(jnp.eye(D, dtype=cov.dtype), cov.shape),
            lower=True)
        precision = jnp.matmul(Linv.conj().swapaxes(-2, -1), Linv,
                               precision=_HIGHEST)
        diag = jnp.diagonal(L, axis1=-2, axis2=-1).real
        logdet = 2.0 * jnp.sum(jnp.log(jnp.maximum(diag, tiny)), axis=-1)
        return precision, logdet
    else:
        raise ValueError(f'unknown inverse mode {config.inverse!r}')


def _e_step(z, params, source_activity_mask):
    """One E-step for a single frequency.

    Returns (gamma (K, T), quadratic_form (K, T)).
    """
    log_weight, precision, logdet = params
    D = z.shape[-1]
    rdtype = logdet.dtype
    tiny = jnp.finfo(rdtype).tiny

    # q_kt = z_t^H P_k z_t: one K-batched matmul + row-wise dot.
    vz = jnp.einsum('kde,te->ktd', precision, z,
                    precision=_HIGHEST)                # (K, T, D)
    quadratic_form = jnp.einsum('ktd,td->kt', vz, z.conj(),
                                precision=_HIGHEST).real
    quadratic_form = jnp.maximum(quadratic_form, tiny)  # (K, T)

    log_pdf = (
        log_weight[:, None]
        - D * jnp.log(quadratic_form)
        - logdet[:, None]
    )
    # Mask in the LOG domain: the per-frame max is then taken over the
    # ACTIVE classes, so after exp the best active class is exactly 1 and
    # the normalizing sum is >= 1 — identical posteriors mathematically
    # (softmax is shift-invariant), but no denormal-over-denormal
    # normalization for frames whose most likely class is masked out.
    # That arithmetic was the round-3 fusion-NaN source at production
    # scale: x / max(s, tiny) with a denormal s can become x * inf under
    # a fused fast-reciprocal.  The final select keeps all-masked frames
    # (no active class) at exactly 0.
    if source_activity_mask is not None:
        log_pdf = jnp.where(source_activity_mask > 0, log_pdf,
                            jnp.asarray(-1e30, log_pdf.dtype))
    log_pdf = log_pdf - jnp.max(log_pdf, axis=0, keepdims=True)
    gamma = jnp.exp(log_pdf).astype(rdtype)
    if source_activity_mask is not None:
        gamma = gamma * source_activity_mask.astype(rdtype)
    s = jnp.sum(gamma, axis=0, keepdims=True)
    gamma = jnp.where(s > 0.5, gamma / jnp.maximum(s, tiny),
                      jnp.zeros((), rdtype))
    return gamma, quadratic_form


def _fused_em_iteration(z, params, source_activity_mask, frame_mask,
                        config: CacgmmConfig):
    """One (E, M) iteration as a T-chunked ``lax.scan``: per chunk the
    quadratic forms and responsibilities live in VMEM and only the
    (K, D, D) scatter + (K,) affiliation-mass accumulators survive — the
    unfused path writes ~1.2 GB of (K, T, D) intermediates to HBM per
    iteration for the headline config (measured as the dominant EM cost).

    Algebraic identity with the unfused path: the M-step's 1/denom_k
    factor is constant over t, so it is pulled out of the scatter sum and
    applied once after the scan.
    """
    log_weight, precision, logdet = params
    rdtype = logdet.dtype
    tiny = jnp.finfo(rdtype).tiny
    T, D = z.shape
    K = log_weight.shape[0]
    chunk = config.em_chunk_size
    pad = (-T) % chunk
    zp = jnp.pad(z, ((0, pad), (0, 0)))
    fm = frame_mask if frame_mask is not None \
        else jnp.ones((T,), bool)
    fmp = jnp.pad(fm, (0, pad))              # padding frames excluded
    nc = (T + pad) // chunk
    xs = [zp.reshape(nc, chunk, D), fmp.reshape(nc, chunk)]
    if source_activity_mask is not None:
        xs.append(jnp.pad(source_activity_mask.astype(bool),
                          ((0, 0), (0, pad)), constant_values=True)
                  .reshape(K, nc, chunk).swapaxes(0, 1))

    def body(carry, inputs):
        S, denom = carry
        zc, fmc = inputs[:2]
        # E-step on the chunk (same math as _e_step)
        vz = jnp.einsum('kde,te->ktd', precision, zc,
                        precision=_HIGHEST)
        q = jnp.maximum(jnp.einsum('ktd,td->kt', vz, zc.conj(),
                                   precision=_HIGHEST).real, tiny)
        log_pdf = log_weight[:, None] - D * jnp.log(q) - logdet[:, None]
        # mask in the log domain + select-guarded normalization — the
        # same fusion-proof formulation as _e_step (see its comment)
        if len(inputs) > 2:
            log_pdf = jnp.where(inputs[2], log_pdf,
                                jnp.asarray(-1e30, log_pdf.dtype))
        log_pdf = log_pdf - jnp.max(log_pdf, axis=0, keepdims=True)
        gamma = jnp.exp(log_pdf).astype(rdtype)
        if len(inputs) > 2:
            gamma = gamma * inputs[2].astype(rdtype)
        s = jnp.sum(gamma, axis=0, keepdims=True)
        gamma = jnp.where(s > 0.5, gamma / jnp.maximum(s, tiny),
                          jnp.zeros((), rdtype))
        gamma = gamma * fmc[None, :].astype(rdtype)
        # M-step accumulation (denominator division deferred); the
        # select pins coeff to exactly 0 where gamma == 0 (q can sit at
        # its tiny clamp on zero-padded frames — same reciprocal hazard)
        denom = denom + jnp.sum(gamma, axis=-1)
        coeff = jnp.where(gamma > 0, gamma / q, jnp.zeros((), rdtype))
        weighted = zc[None, :, :] * coeff[:, :, None].astype(zc.dtype)
        S = S + jnp.einsum('ktd,te->kde', weighted, zc.conj(),
                           precision=_HIGHEST)
        return (S, denom), None

    init = (jnp.zeros((K, D, D), z.dtype), jnp.zeros((K,), rdtype))
    (S, denom), _ = jax.lax.scan(body, init, tuple(xs))

    total = jnp.sum(denom)
    weight = jnp.where(total > 0, denom / jnp.maximum(total, tiny),
                       jnp.zeros((), rdtype))
    log_weight = jnp.log(jnp.maximum(weight, tiny))
    # overflow-aware denominator floor: D / tiny overflows float32 to
    # inf, and an empty class (gamma == 0 everywhere -> S == 0,
    # denom == 0) would then produce cov = 0 * inf = NaN that poisons
    # every class in the next E-step.  The floor only binds when S is
    # (numerically) zero, where any finite scale gives cov ~ 0 + jitter.
    denom_floor = 2.0 * D / jnp.finfo(rdtype).max
    cov = _trace_normalize(hermitize(
        S * (D / jnp.maximum(denom, denom_floor))[:, None, None]
        .astype(z.dtype)))
    precision, logdet = _invert(cov, config)
    return log_weight, precision, logdet.astype(rdtype)


def _cacgmm_single_frequency(y, initialization, source_activity_mask,
                             frame_mask, config: CacgmmConfig):
    """Full EM for one frequency bin.  y (T, D) -> posterior (K, T)."""
    z = _normalize_observations(y)

    gamma = initialization
    quadratic_form = jnp.ones_like(gamma)

    # First M-step consumes the (floored, un-masked) initialization directly,
    # like the reference fit loop: the source-activity mask only enters the
    # E-step (pb_bss _predict semantics).
    params = _m_step(z, gamma, quadratic_form, frame_mask, config)

    if config.em_chunk_size:
        # fused chunked (E, M) iterations — identical math, HBM-light
        params = jax.lax.fori_loop(
            0, config.iterations - 1,
            lambda _, p: _fused_em_iteration(
                z, p, source_activity_mask, frame_mask, config),
            params)
        if config.iterations_post == 0:
            posterior, _ = _e_step(z, params, source_activity_mask)
        else:
            params = jax.lax.fori_loop(
                0, config.iterations_post - 1,
                lambda _, p: _fused_em_iteration(
                    z, p, None, frame_mask, config),
                params)
            posterior, _ = _e_step(z, params, None)
        return posterior

    def fit_body(_, carry):
        gamma, quadratic_form, params = carry
        gamma, quadratic_form = _e_step(z, params, source_activity_mask)
        params = _m_step(z, gamma, quadratic_form, frame_mask, config)
        return gamma, quadratic_form, params

    gamma, quadratic_form, params = jax.lax.fori_loop(
        0, config.iterations - 1, fit_body,
        (gamma, quadratic_form, params))

    if config.iterations_post == 0:
        posterior, _ = _e_step(z, params, source_activity_mask)
    else:
        def post_body(_, carry):
            gamma, quadratic_form, params = carry
            gamma, quadratic_form = _e_step(z, params, None)
            params = _m_step(z, gamma, quadratic_form, frame_mask, config)
            return gamma, quadratic_form, params

        gamma, quadratic_form, params = jax.lax.fori_loop(
            0, config.iterations_post - 1, post_body,
            (gamma, quadratic_form, params))
        posterior, _ = _e_step(z, params, None)
    return posterior


def _cacgmm_posteriors_pallas(Y, initialization, source_activity_mask,
                              frame_mask, config: CacgmmConfig):
    """Full-F driver around the fused Pallas E+M kernel (the kernel owns
    the F axis in its grid, so no vmap here; the per-iteration covariance
    inverse stays in XLA, batched over (F, K)).

    Precondition: ``initialization`` (K, T) must be column-normalized over
    classes (sum_k init[k, t] == 1 where any class is active).  The fused
    first M-step feeds it through the E-step's per-frame normalization
    (identity precisions -> gamma == init only when already normalized);
    an unnormalized initialization would make this backend diverge from
    the XLA one, so it is normalized defensively below —
    ``make_initialization`` already guarantees it."""
    from pb_chime5_tpu.ops.pallas.fused_em import (
        fused_em_scatter_prepared, prepare_activity, prepare_em_inputs)

    z = _normalize_observations(Y)                       # (F, T, D)
    F, T, D = z.shape
    K = initialization.shape[0]
    rdtype = jnp.float32
    tiny = jnp.finfo(rdtype).tiny

    # padded [zr|zi] planes + masks are loop constants — build them once;
    # the activity variants only need their own (Tp, K) plane
    z2m, act_m, fm2 = prepare_em_inputs(
        z, source_activity_mask, frame_mask, K)
    act_1 = prepare_activity(None, T, K)

    def finalize(S, denom):
        total = jnp.sum(denom, axis=-1, keepdims=True)
        weight = jnp.where(total > 0,
                           denom / jnp.maximum(total, tiny),
                           jnp.zeros((), rdtype))
        log_weight = jnp.log(jnp.maximum(weight, tiny))
        # overflow-aware floor: D / tiny is inf in float32; an empty
        # class (denom == 0 after the masked E-step, S == 0) must give
        # cov 0 (+ jitter), not 0 * inf = NaN — which poisoned EVERY
        # class from EM iteration 2 on for real sessions where a speaker
        # is silent in the utterance window (found on-chip, round 3).
        denom_floor = 2.0 * D / jnp.finfo(rdtype).max
        cov = _trace_normalize(hermitize(
            S * (D / jnp.maximum(denom, denom_floor))[..., None, None]
            .astype(S.dtype)))
        precision, logdet = _invert(cov, config, batched=True)
        return log_weight, precision, logdet.astype(rdtype)

    def iteration(params, act):
        S, denom = fused_em_scatter_prepared(z2m, act, fm2, params, D=D)
        return finalize(S, denom)

    # First M-step through the same kernel: with identity precisions and
    # zero log-weights/logdets the E-step is the identity on the
    # (column-normalized) initialization — q = z^H I z = 1 for the
    # unit-normalized z, log_pdf = 0, so gamma = init exactly — and the
    # scatter equals the reference's initialization-driven first fit
    # step (core.py:156-163) without materializing the unfused
    # (F, K, T, D) weighted intermediate.
    init = initialization.astype(rdtype)
    init = init / jnp.maximum(jnp.sum(init, axis=0, keepdims=True), tiny)
    act_init = prepare_activity(init, T, K)
    eye = jnp.broadcast_to(jnp.eye(D, dtype=z.dtype), (F, K, D, D))
    params0 = (jnp.zeros((F, K), rdtype), eye, jnp.zeros((F, K), rdtype))
    S0, den0 = fused_em_scatter_prepared(z2m, act_init, fm2, params0, D=D)
    params = finalize(S0, den0)

    params = jax.lax.fori_loop(
        0, config.iterations - 1,
        lambda _, p: iteration(p, act_m), params)

    def final_e(mask):
        return jax.vmap(lambda zf, lw, pr, ld: _e_step(
            zf, (lw, pr.astype(zf.dtype), ld.astype(zf.real.dtype)),
            mask)[0])(z, *params)

    if config.iterations_post == 0:
        return final_e(source_activity_mask)
    params = jax.lax.fori_loop(
        0, config.iterations_post - 1,
        lambda _, p: iteration(p, act_1), params)
    return final_e(None)


# ---------------------------------------------------------------------------
# Debug introspection (VERDICT r3 missing #3): the reference collects
# per-iteration parameters for debugging (``stack_parameters``,
# pb_chime5/core.py:27-29, 211) and prints per-50-bins progress
# (core.py:173-175).  The fused production program is a black box when an
# utterance comes out bad; this opt-in twin runs the SAME unfused XLA EM
# and additionally records, per M-step (axis 0 = EM iteration, including
# the init-driven first M-step and any post iterations):
#
#   weights   (I, F, K)  mixture weights alpha_k
#   logdet    (I, F, K)  log|B_k| of the (trace-normalized) covariances
#   condition (I, F, K)  trace(B_k) * trace(B_k^-1) / D^2 — a matmul-free
#                        condition-number proxy (>= 1, equality iff B ~ I);
#                        exploding values mark collapsing classes
#   posterior_entropy (I, F)  mean over valid frames of the class-posterior
#                        entropy fed into that M-step — low entropy early =
#                        confident (usually good) separation, high entropy
#                        late = the EM never decided
#
# The production programs are untouched: this is a separate jit.
# ---------------------------------------------------------------------------

def _m_step_stats(params, D):
    log_weight, precision, logdet = params
    weights = jnp.exp(log_weight)
    # cov is trace-normalized to D, so trace(B)*trace(B^-1)/D^2 reduces
    # to trace(precision)/D
    cond = jnp.trace(precision, axis1=-2, axis2=-1).real / D
    return weights, logdet, cond


def _gamma_entropy(gamma, frame_mask):
    """Mean class-posterior entropy over valid frames (0 log 0 := 0)."""
    rdtype = gamma.dtype
    plogp = jnp.where(gamma > 0, gamma * jnp.log(gamma),
                      jnp.zeros((), rdtype))
    ent = -jnp.sum(plogp, axis=0)                          # (T,)
    if frame_mask is not None:
        m = frame_mask.astype(rdtype)
        return jnp.sum(ent * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(ent)


def _cacgmm_single_frequency_debug(y, initialization, source_activity_mask,
                                   frame_mask, config: CacgmmConfig):
    """Debug twin of :func:`_cacgmm_single_frequency` (unfused XLA path
    only — introspection, not speed): returns (posterior, per-iteration
    stats pytree)."""
    z = _normalize_observations(y)
    D = z.shape[-1]

    gamma = initialization
    quadratic_form = jnp.ones_like(gamma)
    params = _m_step(z, gamma, quadratic_form, frame_mask, config)
    rec0 = (*_m_step_stats(params, D), _gamma_entropy(gamma, frame_mask))

    def fit_body(carry, _):
        gamma, quadratic_form, params = carry
        gamma, quadratic_form = _e_step(z, params, source_activity_mask)
        params = _m_step(z, gamma, quadratic_form, frame_mask, config)
        rec = (*_m_step_stats(params, D),
               _gamma_entropy(gamma, frame_mask))
        return (gamma, quadratic_form, params), rec

    carry, recs = jax.lax.scan(
        fit_body, (gamma, quadratic_form, params), None,
        length=config.iterations - 1)
    gamma, quadratic_form, params = carry

    recs_post = None
    if config.iterations_post == 0:
        posterior, _ = _e_step(z, params, source_activity_mask)
    else:
        def post_body(carry, _):
            gamma, quadratic_form, params = carry
            gamma, quadratic_form = _e_step(z, params, None)
            params = _m_step(z, gamma, quadratic_form, frame_mask, config)
            rec = (*_m_step_stats(params, D),
                   _gamma_entropy(gamma, frame_mask))
            return (gamma, quadratic_form, params), rec

        carry, recs_post = jax.lax.scan(
            post_body, (gamma, quadratic_form, params), None,
            length=config.iterations_post - 1)
        gamma, quadratic_form, params = carry
        posterior, _ = _e_step(z, params, None)

    def stack(i):
        parts = [recs[i]] if config.iterations > 1 else []
        parts = [rec0[i][None]] + parts
        if recs_post is not None and config.iterations_post > 1:
            parts.append(recs_post[i])
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 \
            else parts[0]

    stats = tuple(stack(i) for i in range(4))
    return posterior, stats


@functools.partial(jax.jit, static_argnames=('config', 'has_frame_mask'))
def _cacgmm_posteriors_debug_impl(Y, initialization, source_activity_mask,
                                  frame_mask, config, has_frame_mask):
    fm = frame_mask if has_frame_mask else None
    fn = lambda y: _cacgmm_single_frequency_debug(
        y, initialization, source_activity_mask, fm, config)
    posterior, stats = jax.vmap(fn)(Y)       # stats leaves: (F, I, ...)
    weights, logdet, cond, entropy = (
        jnp.moveaxis(s, 0, 1) for s in stats)    # -> (I, F, ...)
    return posterior, {
        'weights': weights, 'logdet': logdet, 'condition': cond,
        'posterior_entropy': entropy,
    }


def cacgmm_posteriors_debug(Y, activity, *,
                            config: CacgmmConfig = CacgmmConfig(),
                            frame_mask=None):
    """:func:`cacgmm_posteriors` with per-iteration EM introspection.

    Returns (posteriors (F, K, T), debug dict) — see the section comment
    above for the debug keys.  Always runs the unfused XLA EM (identical
    math to the production backends; the Pallas/chunked variants differ
    only in float reassociation)."""
    Y = jnp.asarray(Y)
    rdtype = Y.real.dtype
    activity = jnp.asarray(activity)
    initialization = make_initialization(activity, dtype=rdtype)
    source_activity_mask = activity.astype(bool)
    if frame_mask is None:
        frame_mask_arr = jnp.ones((Y.shape[1],), dtype=bool)
    else:
        frame_mask_arr = jnp.asarray(frame_mask, dtype=bool)
    return _cacgmm_posteriors_debug_impl(
        Y, initialization, source_activity_mask, frame_mask_arr,
        config, frame_mask is not None)


@functools.partial(jax.jit, static_argnames=('config', 'has_frame_mask'))
def _cacgmm_posteriors_impl(Y, initialization, source_activity_mask,
                            frame_mask, config, has_frame_mask):
    fm = frame_mask if has_frame_mask else None
    backend = config.em_backend
    if backend == 'auto':
        backend = ('pallas' if jax.default_backend() == 'tpu' else 'xla')
    if backend == 'pallas':
        return _cacgmm_posteriors_pallas(
            Y, initialization, source_activity_mask, fm, config)
    assert backend == 'xla', backend
    fn = lambda y: _cacgmm_single_frequency(
        y, initialization, source_activity_mask, fm, config)
    return jax.vmap(fn)(Y)


def cacgmm_posteriors(
        Y,
        activity,
        *,
        config: CacgmmConfig = CacgmmConfig(),
        frame_mask=None,
):
    """Guided source separation posteriors.

    Args:
      Y: (F, T, D) complex spectrogram (frequency-major, matching the
         reference's per-frequency ``Obs.T[f]`` slicing, core.py:181).
      activity: (K, T) boolean/float per-class frame activity; provides both
         the EM initialization (floored + normalized) and the
         source-activity mask.
      config: EM iteration/conditioning settings.
      frame_mask: optional (T,) boolean validity mask for padded batches.

    Returns:
      (F, K, T) class posteriors ("masks").
    """
    Y = jnp.asarray(Y)
    rdtype = Y.real.dtype
    activity = jnp.asarray(activity)
    initialization = make_initialization(activity, dtype=rdtype)
    source_activity_mask = activity.astype(bool)
    if frame_mask is None:
        frame_mask_arr = jnp.ones((Y.shape[1],), dtype=bool)
    else:
        frame_mask_arr = jnp.asarray(frame_mask, dtype=bool)
    return _cacgmm_posteriors_impl(
        Y, initialization, source_activity_mask, frame_mask_arr,
        config, frame_mask is not None)
