#!/usr/bin/env python
"""Single-image anomaly-map CLI (the reference README.md:48-54 promises this
entry point; the file is absent from the reference snapshot, so the interface
follows the README: --image_path, --class_name, --save_path, --visualize).

With a trained checkpoint under --save_path the adapted pipeline runs; with
none, a zero-shot map is produced from the raw CLIP + surgery features and
frozen text anchors (the stage-1 feature path, train.py:75-85).
"""
import argparse

from aa_clip_iqm_tpu.platform import apply_platform_override

apply_platform_override()
import os

import numpy as np

import jax.numpy as jnp

from aa_clip_iqm_tpu.data.datasets import _load_image, normalize_clip
from aa_clip_iqm_tpu.data.registry import DATASETS
from aa_clip_iqm_tpu.evaluation.predict import make_predict_fn
from aa_clip_iqm_tpu.evaluation.scoring import similarity_map_test
from aa_clip_iqm_tpu.loader import (
    build_model_config,
    init_trainable,
    load_frozen_backbone,
)
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.prompts import compute_class_anchor
from aa_clip_iqm_tpu.train import checkpoint as ckpt
from aa_clip_iqm_tpu.train.steps import make_stage1_visual_fn
from aa_clip_iqm_tpu.utils import setup_seed


def find_dataset_for_class(class_name):
    for ds, info in DATASETS.items():
        if class_name in info["classes"]:
            return ds
    return None


def main():
    parser = argparse.ArgumentParser(description="Single image test")
    parser.add_argument("--model_name", type=str, default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--image_path", type=str, required=True)
    parser.add_argument("--class_name", type=str, default="object",
                        help="object class for the prompt ensemble; 'object' "
                        "works generically")
    parser.add_argument("--dataset", type=str, default=None,
                        help="dataset whose prompt real-names to use; "
                        "inferred from --class_name when omitted")
    parser.add_argument("--save_path", type=str, default=None,
                        help="checkpoint dir; omit for zero-shot")
    parser.add_argument("--backbone", type=str, default=None)
    parser.add_argument("--random_backbone", action="store_true")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--out", type=str, default="anomaly_map.png")
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--use_pallas", action="store_true")
    args = parser.parse_args()
    setup_seed(args.seed)

    model_cfg = build_model_config(model_name=args.model_name,
                                   img_size=args.img_size)
    frozen = load_frozen_backbone(model_cfg, args.backbone,
                                  allow_random=args.random_backbone)
    trainable = init_trainable(model_cfg, seed=args.seed)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        args.compute_dtype]

    dataset = args.dataset or find_dataset_for_class(args.class_name)
    domain = DATASETS.get(dataset, {}).get("domain", "Industrial")

    img = normalize_clip(_load_image(args.image_path, args.img_size))
    images = jnp.asarray(img[None])

    use_ckpt = args.save_path and ckpt.latest_numbered_dir(args.save_path)
    if use_ckpt:
        trainable, adapted, _ = ckpt.restore_adapters(args.save_path,
                                                      trainable)

        def encode(tokens):
            if adapted:
                return adapters_mod.encode_text_adapted(
                    frozen, trainable, model_cfg, tokens, compute_dtype=dtype)
            return adapters_mod.encode_text_frozen(
                frozen, model_cfg, tokens, compute_dtype=dtype)

        anchor = compute_class_anchor(encode, dataset or "MVTec",
                                      args.class_name)
        predict = make_predict_fn(model_cfg, args.img_size, domain,
                                  compute_dtype=dtype,
                                  use_pallas=args.use_pallas)
        final_map, logit = predict(frozen, trainable, images, anchor[None])
        score = float(logit[0])
    else:
        # Zero-shot: surgery patch features vs frozen CLIP anchors.
        def encode(tokens):
            return adapters_mod.encode_text_frozen(frozen, model_cfg, tokens,
                                                   compute_dtype=dtype)

        anchor = compute_class_anchor(encode, dataset or "MVTec",
                                      args.class_name)
        visual_fn = make_stage1_visual_fn(model_cfg, compute_dtype=dtype,
                                          use_pallas=args.use_pallas)
        feats = visual_fn(frozen, images)
        maps = [
            similarity_map_test(f, anchor[None], args.img_size, domain)
            for f in feats
        ]
        final_map = sum(maps)
        score = float(np.max(np.asarray(final_map)))

    final_map = np.asarray(final_map)[0]
    print(f"image anomaly score: {score:.4f}")
    print(f"map range: [{final_map.min():.4f}, {final_map.max():.4f}]")

    if args.visualize:
        import cv2

        from aa_clip_iqm_tpu.evaluation.visualize import render_overlay

        orig = cv2.imread(args.image_path)
        orig = cv2.resize(orig, (args.img_size, args.img_size))
        overlay = render_overlay(orig, final_map)
        cv2.imwrite(args.out, overlay)
        print(f"saved visualization to {args.out}")
    else:
        np.save(os.path.splitext(args.out)[0] + ".npy", final_map)
        print(f"saved raw map to {os.path.splitext(args.out)[0]}.npy")


if __name__ == "__main__":
    main()
