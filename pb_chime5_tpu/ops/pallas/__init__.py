"""Pallas TPU kernels for the hot ops."""

from pb_chime5_tpu.ops.pallas.hermitian_inverse import (
    hermitian_inverse_and_logdet,
)
