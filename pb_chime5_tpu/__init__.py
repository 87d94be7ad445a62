"""pb_chime5_tpu — a TPU-native (JAX/XLA/Pallas) guided source separation front-end.

A from-scratch rebuild of the capabilities of fgnt/pb_chime5 (the Paderborn
CHiME-5/6 "GSS" speech-enhancement front-end) designed for TPU hardware:

* The numeric hot path (STFT -> WPE dereverberation -> cacGMM EM ("GSS")
  -> MVDR/GEV beamforming -> iSTFT) is a single jittable complex program in
  ``pb_chime5_tpu.ops`` / ``pb_chime5_tpu.models``.  The reference's
  per-frequency Python EM loop (reference: pb_chime5/core.py:171-206) becomes
  a ``vmap`` over the frequency axis; utterances become a padded batch
  dimension shardable over a ``jax.sharding.Mesh``.
* The host side (database, activity intervals, audio I/O, scheduling,
  config) reproduces the reference's behaviour with plain Python plus an
  optional C++ extension for the interval algebra and WAV I/O.
* The MPI master/worker pool (reference: dlp_mpi via core.py:381) is replaced
  by length-aware static sharding plus an optional host-side work queue in
  ``pb_chime5_tpu.parallel``.

Unlike the reference, this package does *not* pin numeric libraries to a
single thread (reference: pb_chime5/__init__.py:6-14) — on TPU the goal is
the inverse: keep the chip saturated with batched linear algebra.
"""

from pathlib import Path

__version__ = '0.1.0'

package_root = Path(__file__).parent
repo_root = package_root.parent
