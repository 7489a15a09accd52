#!/usr/bin/env python
"""Shim: reference-style `python test.py ...` -> aa_clip_iqm_tpu.cli.evaluate."""
from aa_clip_iqm_tpu.cli.evaluate import build_parser, main  # noqa: F401

if __name__ == "__main__":
    main()
