"""Host-side math helpers."""
from pb_chime5_tpu.math.solve import stable_solve
