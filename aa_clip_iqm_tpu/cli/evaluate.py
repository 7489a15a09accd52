#!/usr/bin/env python
"""Batch evaluation CLI (the reference README's promised test.py; semantics of
test_last.py:160-330): loads the latest stage-2 checkpoint, recomputes adapted
text anchors, sweeps every class of the dataset and prints the metric table.
"""
import argparse

from aa_clip_iqm_tpu.platform import apply_platform_override

apply_platform_override()

import jax

from aa_clip_iqm_tpu.configs import EvalConfig
from aa_clip_iqm_tpu.data.datasets import get_dataset
from aa_clip_iqm_tpu.evaluation.predict import evaluate_dataset, results_table
from aa_clip_iqm_tpu.loader import (
    build_model_config,
    init_trainable,
    load_frozen_backbone,
)
from aa_clip_iqm_tpu.train import checkpoint as ckpt
from aa_clip_iqm_tpu.train.driver import compute_frozen_anchors
from aa_clip_iqm_tpu.utils import setup_logger, setup_seed

import jax.numpy as jnp


def build_parser():
    parser = argparse.ArgumentParser(description="Evaluation")
    parser.add_argument("--model_name", type=str, default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--relu", action="store_true")
    parser.add_argument("--backbone", type=str, default=None)
    parser.add_argument("--random_backbone", action="store_true")
    parser.add_argument("--dataset", type=str, default="MVTec")
    parser.add_argument("--batch_size", type=int, default=32,
                        help="accepted for reference-CLI compatibility; the "
                        "eval loader uses --image_batch_size (the reference's "
                        "test_last.py has the same pair and likewise only "
                        "uses image_batch_size)")
    parser.add_argument("--image_batch_size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--save_path", type=str, default="ckpt/baseline")
    parser.add_argument("--metadata_root", type=str, default=None)
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--text_adapt_weight", type=float, default=0.1)
    parser.add_argument("--image_adapt_weight", type=float, default=0.1)
    parser.add_argument("--text_adapt_until", type=int, default=3)
    parser.add_argument("--image_adapt_until", type=int, default=6)
    parser.add_argument("--iqm_hidden_size", type=int, default=512)
    parser.add_argument("--iqm_num_layers", type=int, default=2)
    parser.add_argument("--iqm_num_heads", type=int, default=8)
    parser.add_argument("--iqm_weight", type=float, default=0.4)
    parser.add_argument("--text_weight", type=float, default=0.6)
    parser.add_argument("--image_score_mode", type=str, default="fixed",
                        choices=["fixed", "reference_eval"],
                        help="image-level score semantics: 'fixed' = "
                        "per-sample abnormal logit (the reference's own "
                        "train semantics); 'reference_eval' = exact "
                        "transcription of its executed eval path (survey "
                        "Q11, batch-composition dependent) for parity "
                        "studies")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--data_parallel", action="store_true")
    parser.add_argument("--use_pallas", action="store_true")
    parser.add_argument("--no_adapters", action="store_true",
                        help="evaluate without any trained checkpoint "
                        "(zero-shot plumbing check)")
    parser.add_argument("--import_reference", action="store_true",
                        help="treat --save_path as a PyTorch-reference "
                        "checkpoint dir (text_adapter.pth / "
                        "image_adapter_N.pth) and import the adapters")
    parser.add_argument("--quantize_backbone", type=str, default=None,
                        choices=["int8", "int8_attn", "int8_mlp", "int8+smooth",
                                  "int8_attn+smooth", "int8_mlp+smooth"],
                        help="int8 frozen-backbone inference tier; "
                        "'int8_attn' quantizes only the attention "
                        "projections and keeps the fused MLP kernel "
                        "(fastest measured tier; docs/DESIGN.md)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--debug_nans", action="store_true")
    return parser


def main():
    args = build_parser().parse_args()
    setup_seed(args.seed)
    logger = setup_logger(args.save_path, "test.log")
    logger.info("args: %s", vars(args))

    model_cfg = build_model_config(
        model_name=args.model_name, img_size=args.img_size, relu=args.relu,
        text_adapt_weight=args.text_adapt_weight,
        image_adapt_weight=args.image_adapt_weight,
        text_adapt_until=args.text_adapt_until,
        image_adapt_until=args.image_adapt_until,
        iqm_hidden_size=args.iqm_hidden_size,
        iqm_num_layers=args.iqm_num_layers,
        iqm_num_heads=args.iqm_num_heads,
    )
    frozen = load_frozen_backbone(model_cfg, args.backbone,
                                  allow_random=args.random_backbone)
    if args.quantize_backbone:
        from aa_clip_iqm_tpu.ops.quant import quantize_backbone_auto

        # use_pallas also routes the '+smooth' calibration forward through
        # the flash kernels (the XLA-attention flagship calibration compile
        # can outlive the tunnel connection — ops/quant.py).
        frozen = quantize_backbone_auto(frozen, args.quantize_backbone,
                                        cfg=model_cfg,
                                        use_pallas=args.use_pallas)
        logger.info("frozen backbone quantized (tier=%s)",
                    args.quantize_backbone)
    trainable = init_trainable(model_cfg, seed=args.seed)

    if args.debug_nans:
        from aa_clip_iqm_tpu.utils.profiling import enable_nan_checks

        enable_nan_checks(True)

    adapt_text = False
    if args.import_reference:
        import os

        from aa_clip_iqm_tpu.models.convert import import_reference_checkpoints

        trainable = import_reference_checkpoints(args.save_path, trainable,
                                                 relu=args.relu)
        adapt_text = os.path.isfile(
            os.path.join(args.save_path, "text_adapter.pth"))
        logger.info("imported reference adapters from %s", args.save_path)
    elif not args.no_adapters:
        trainable, adapt_text, epoch = ckpt.restore_adapters(args.save_path,
                                                             trainable)
        logger.info("-----------------------------------------------")
        logger.info("load model from epoch %d", epoch)
        logger.info("-----------------------------------------------")

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        args.compute_dtype]
    anchors = compute_frozen_anchors(frozen, trainable, model_cfg,
                                     args.dataset, adapted=adapt_text,
                                     compute_dtype=dtype)
    datasets = get_dataset(args.dataset, args.img_size, None, -1, "test",
                           logger=logger, metadata_root=args.metadata_root,
                           device_normalize=True)

    mesh = None
    if args.data_parallel and jax.device_count() > 1:
        from aa_clip_iqm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    eval_cfg = EvalConfig(
        dataset=args.dataset, img_size=args.img_size,
        batch_size=args.image_batch_size, seed=args.seed,
        save_path=args.save_path, visualize=args.visualize,
        iqm_weight=args.iqm_weight, text_weight=args.text_weight,
        compute_dtype=args.compute_dtype,
        image_score_mode=args.image_score_mode,
    )
    from aa_clip_iqm_tpu.utils.profiling import trace

    with trace(args.profile_dir):
        rows = evaluate_dataset(
            frozen, trainable, model_cfg, eval_cfg, datasets, anchors,
            logger=logger,
            visualize_dir=args.save_path if args.visualize else None,
            mesh=mesh, compute_dtype=dtype, use_pallas=args.use_pallas)
    table = results_table(rows)
    logger.info("final results:\n%s", table)
    print(table)


if __name__ == "__main__":
    main()
