#!/usr/bin/env python
"""Shim: `python bench.py` -> aa_clip_iqm_tpu.cli.bench (one JSON line)."""
from aa_clip_iqm_tpu.cli.bench import main_dispatch  # noqa: F401

if __name__ == "__main__":
    main_dispatch()
