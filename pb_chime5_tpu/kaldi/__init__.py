"""Kaldi bridge (CPU-only, subprocess-based).

Optional module: everything here shells out to Kaldi binaries found via
the ``KALDI_ROOT`` environment variable (reference: pb_chime5/kaldi/).
Importing the package itself does not require Kaldi; the env check happens
on first use.
"""

from pb_chime5_tpu.kaldi import (  # noqa: F401
    alignment, decode, fst, helper, io, transcription)
