"""Command-line entry points (reference: pb_chime5/scripts/)."""
