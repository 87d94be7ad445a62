"""TPU compute-path ops (pure JAX, jittable, vmap/shard_map friendly).

Every op in this package is a pure function over jax arrays with static
shapes, so the whole enhancement chain STFT -> WPE -> cacGMM -> beamformer
-> iSTFT compiles to one XLA program.
"""

from pb_chime5_tpu.ops.stft import (
    stft,
    istft,
    stft_frame_count,
    samples_to_stft_frames,
    blackman_window,
    biorthogonal_synthesis_window,
)
from pb_chime5_tpu.ops.linalg import (
    hermitize,
    stable_solve,
    stable_cholesky,
)
from pb_chime5_tpu.ops.wpe import wpe
from pb_chime5_tpu.ops.cacgmm import cacgmm_posteriors, CacgmmConfig
from pb_chime5_tpu.ops.beamform import (
    psd_matrix,
    mvdr_souden_vector,
    gev_vector,
    lcmv_vector,
    blind_analytic_normalization,
    apply_beamforming_vector,
    beamform_mvdr_souden_from_masks,
    beamform_gev_from_masks,
    beamform_lcmv_from_masks,
)
from pb_chime5_tpu.ops.masks import lorenz_mask, quantile_mask
