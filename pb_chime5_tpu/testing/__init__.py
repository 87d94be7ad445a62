"""Test fixtures: miniature synthetic CHiME-5/6-format datasets."""

from pb_chime5_tpu.testing.synthetic import (
    create_synthetic_chime5,
    samples_to_time_str,
)
from pb_chime5_tpu.testing.soak import (
    run_session_soak,
    windowed_means,
    read_rss_mb,
)
