"""Host-side utilities (NumPy / pure Python)."""

from pb_chime5_tpu.utils.array_interval import (
    ArrayInterval,
    array_intervals_from_rttm,
)
from pb_chime5_tpu.utils.activity_freq import (
    activity_time_to_frequency,
    activity_frequency_to_time,
    segment_axis,
)
from pb_chime5_tpu.utils.dict_utils import merge, Dispatcher
