#!/usr/bin/env python
"""One-time backbone conversion: OpenAI CLIP .pt -> torch-free .npz cache.

    python tools/convert_backbone.py --pt ViT-L-14-336px.pt --img_size 518

Writes <pt-stem>.<img_size>.npz next to the input (the loaders discover it
automatically); pass --out to choose another path. Requires torch only for
this step.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pt", required=True, help="OpenAI .pt checkpoint")
    parser.add_argument("--model_name", default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from aa_clip_iqm_tpu.configs import get_model_config
    from aa_clip_iqm_tpu.models.convert import (
        load_openai_checkpoint,
        save_params_npz,
    )

    cfg = get_model_config(args.model_name, img_size=args.img_size)
    params = load_openai_checkpoint(args.pt, cfg)
    out = args.out or (os.path.splitext(args.pt)[0] + f".{args.img_size}.npz")
    save_params_npz(params, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
