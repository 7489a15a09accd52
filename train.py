#!/usr/bin/env python
"""Shim: reference-style `python train.py ...` -> aa_clip_iqm_tpu.cli.train."""
from aa_clip_iqm_tpu.cli.train import build_parser, main  # noqa: F401

if __name__ == "__main__":
    main()
