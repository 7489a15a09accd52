#!/usr/bin/env python
"""Export the fused anomaly-map predict program as deployable artifacts.

Serializes the whole scoring pipeline (adapted ViT forward, projections, IQM
maps, anchor similarity, blur/upsample, fusion) per batch bucket via
`jax.export`, with backbone + adapter weights baked in, plus per-class
anchors. A serving deployment then needs only `ExportedPredictor` + the
artifact directory — no config registry, checkpoint layout, or model code.

    python tools/export_model.py --dataset MVTec --save_path ckpt/run1 \
        --out exported/mvtec --img_size 518 --batches 1 8 16

Export on the platform you will serve on (jax.export artifacts are
platform-checked): run this under the TPU runtime for TPU serving.
No reference analogue — the reference has no serving surface (SURVEY §7).
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from aa_clip_iqm_tpu.platform import apply_platform_override

apply_platform_override()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--save_path", type=str, default=None,
                   help="training save dir (omit for zero-shot)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--img_size", type=int, default=518)
    p.add_argument("--model_name", type=str, default="ViT-L-14-336")
    p.add_argument("--backbone", type=str, default=None)
    p.add_argument("--random_backbone", action="store_true")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8, 16])
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--quantize_backbone", type=str, default=None,
                   choices=("int8", "int8_attn", "int8_mlp"),
                   help="export the quantized frozen-backbone tier "
                        "(ops/quant.py; int8 measures +20%% img/s @518 — "
                        "docs/DESIGN.md)")
    p.add_argument("--baked", action="store_true",
                   help="embed weights as StableHLO constants instead of the "
                        "default external weights.npz (self-contained but "
                        "~1.3 GB at ViT-L scale with slow deserialization)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifacts and run one batch")
    args = p.parse_args()

    from aa_clip_iqm_tpu.serving import (
        AnomalyDetector,
        ExportedPredictor,
        export_predictor,
    )

    det = AnomalyDetector.from_checkpoint(
        args.save_path, args.dataset, img_size=args.img_size,
        backbone=args.backbone, allow_random_backbone=args.random_backbone,
        model_name=args.model_name, use_pallas=not args.no_pallas,
        quantize=args.quantize_backbone)
    export_predictor(det, args.out, batch_sizes=tuple(args.batches),
                     weights="baked" if args.baked else "external")
    print(f"exported {sorted(args.batches)} -> {args.out}")

    if args.check:
        import numpy as np

        pred = ExportedPredictor(args.out)
        cls = pred.class_names()[0]
        images = np.zeros((1, 3, args.img_size, args.img_size), np.float32)
        maps, scores = pred.predict(images, cls)
        assert maps.shape == (1, args.img_size, args.img_size)
        print(f"check OK: class={cls} map range "
              f"[{maps.min():.4f}, {maps.max():.4f}]")


if __name__ == "__main__":
    main()
