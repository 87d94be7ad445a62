"""Enhancement pipeline models (fused TPU programs + host drivers)."""

from pb_chime5_tpu.models.gss import GssConfig, gss_enhance, GssPipeline
