"""Analytic FLOP accounting for the fused GSS program (VERDICT r4 #3).

Counts the real-arithmetic FLOPs of the matmuls the implemented program
actually dispatches — the real-form WPE statistics (lower-triangular
tap-group blocks + the P fold, ops/wpe.py:_real_form_stats), the
batched EM einsums (ops/cacgmm.py), the DFT-as-matmul STFT/iSTFT
(ops/stft.py) — so ``achieved TFLOP/s = flops / wall`` and
``MFU = achieved / peak`` measure how much of the chip the program
uses, not how lean the algorithm could theoretically be.

Conventions:

* a real matmul (M, C) x (C, N) counts 2*M*N*C FLOPs (multiply-add=2);
* a complex matmul counts 8*M*N*C (4 real products + 2 adds per
  element-pair, the 4-real-dot lowering XLA actually performs);
* O(n^3) solves/inverses are counted with textbook leading terms
  (Cholesky n^3/3 complex, Gauss-Jordan n^3 complex) — they are < 5%
  of the total at production shapes, so the approximation does not
  move the headline MFU;
* elementwise work (masks, power floors, normalizations, window
  multiplies) is EXCLUDED — it is HBM-bound, not MXU work, and
  counting it would inflate MFU.

Peak reference: one TPU v5e chip is 197 TFLOP/s dense bf16 on the MXU;
``precision=HIGHEST`` float32 contractions (the pipeline default — see
ops/wpe.py on why 3-pass 'high' is unsafe here) decompose each operand
into 3 bf16 passes => 6 bf16 products per f32 product, so the
realizable f32 peak is 197/6 ~= 32.8 TFLOP/s.  The ledger's measured
"~18 ms/iter at the FLOP bound" for the complex-einsum WPE statistics
reproduces from exactly these constants (docs/ARCHITECTURE.md).
"""

from pb_chime5_tpu.ops.stft import stft_frame_count

__all__ = ['gss_stage_flops', 'gss_total_flops',
           'V5E_PEAK_TFLOPS_BF16', 'V5E_PEAK_TFLOPS_F32_6PASS']

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_PEAK_TFLOPS_F32_6PASS = V5E_PEAK_TFLOPS_BF16 / 6.0


def _strip_rows(taps, D, lane=128):
    """Row counts of the real-form statistics tap-group strips
    (mirrors ops/wpe.py:_tap_groups)."""
    per = max(1, lane // D)
    return [min(s + per, taps) * D - s * D for s in range(0, taps, per)]


def gss_stage_flops(*, num_samples, D, K, stft_size=1024, stft_shift=256,
                    stft_fading=True, wpe_taps=10, wpe_iterations=3,
                    bss_iterations=20, bss_iterations_post=1):
    """Per-stage dispatched real FLOPs of one fused ``gss_enhance``
    program, as a dict stage -> FLOPs.  Shapes follow the
    implementation: F = stft_size//2 + 1 one-sided bins, T frames from
    :func:`stft_frame_count`."""
    F = stft_size // 2 + 1
    T = stft_frame_count(num_samples, stft_size, stft_shift,
                         fading=stft_fading)
    S = stft_size
    flops = {}

    # STFT: (D*T, S) x (S, F) real + imag DFT matmuls (ops/stft.py)
    flops['stft'] = 2 * (2 * D * T * S * F)

    # WPE (real-form backend, ops/wpe.py:_real_form_stats/_real_form_tail)
    rows = _strip_rows(wpe_taps, D)
    Rt = wpe_taps * D
    n = len(rows)
    # symmetric part: lower tap-group blocks, 2 real dots (UU', VV')
    # each; the LAST diagonal block's right operands carry the P fold
    # (+2D columns per side), remaining strips pay one (r_i, T)x(T, 2D)
    # dot per side for their P rows
    sym = 0
    for i in range(n):
        for j in range(i + 1):
            cols = rows[j] + (2 * D if i == j == n - 1 else 0)
            sym += 2 * (2 * rows[i] * cols * T)
    p_strips = sum(2 * (2 * rows[i] * 2 * D * T) for i in range(n - 1))
    # antisymmetric part: ONE full real (Rt, T) x (T, Rt) dot
    antisym = 2 * Rt * Rt * T
    stats = (sym + p_strips + antisym) * F
    # solve: complex Cholesky Rt^3/3 + two triangular substitutions
    # with D right-hand sides (leading terms; < 5% of the program)
    solve = (8 * Rt ** 3 // 3 + 2 * 8 * Rt * Rt * D) * F
    # tail G^H Ytilde: 4 real (D, r_g)x(r_g, T) dots per strip
    tail = 4 * (2 * D * Rt * T) * F
    flops['wpe_stats'] = stats * wpe_iterations
    flops['wpe_solve'] = solve * wpe_iterations
    flops['wpe_tail'] = tail * wpe_iterations

    # cacGMM EM (ops/cacgmm.py): per iteration and frequency,
    #   E: vz 'kde,te->ktd' (K complex (D,D)x(D,T)) + row-dot 'ktd,td->kt'
    #   M: scatter 'ktd,te->kde' (K complex (D,T)x(T,D))
    #   finalize: K Gauss-Jordan D x D complex inverses
    em_iters = bss_iterations + bss_iterations_post
    e_step = K * (8 * D * D * T + 8 * D * T) * F
    m_step = K * (8 * D * D * T) * F
    inv = K * (8 * D ** 3) * F
    # +1 m_step: the fused initial M-step from the activity init
    flops['em'] = (e_step + m_step + inv) * em_iters + m_step

    # beamformer: target + distortion PSDs, a D x D inverse + matmul
    # (MVDR-Souden numerator), and the w^H X apply (ops/beamform.py)
    psd = 2 * (8 * D * D * T) * F
    mvdr = (8 * D ** 3 + 8 * D ** 3 + 8 * D * D) * F
    apply_ = 8 * D * T * F
    flops['beamform'] = psd + mvdr + apply_

    # iSTFT: one channel, (T, F) x (F, S) real + imag
    flops['istft'] = 2 * (2 * T * F * S)
    return flops


def gss_total_flops(**kwargs):
    """Sum of :func:`gss_stage_flops`."""
    return sum(gss_stage_flops(**kwargs).values())
