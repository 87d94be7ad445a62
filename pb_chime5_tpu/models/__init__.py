"""Enhancement pipeline models (fused TPU programs + host drivers)."""

from pb_chime5_tpu.models.gss import (
    GssConfig, gss_enhance, gss_enhance_split, enhance_spectrogram,
    GssPipeline)
from pb_chime5_tpu.models.enhancer import (
    Activity, Enhancer, get_enhancer, start_end_context_frames)
