#!/usr/bin/env python
"""Shim: `python single_image_test.py ...` -> aa_clip_iqm_tpu.cli.single_image."""
from aa_clip_iqm_tpu.cli.single_image import main  # noqa: F401

if __name__ == "__main__":
    main()
