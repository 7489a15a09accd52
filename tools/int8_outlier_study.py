#!/usr/bin/env python
"""Int8 outlier-robustness study (VERDICT r3 next-round item 3).

Synthesizes the known int8 failure mode — GPT-style outlier channels,
where a handful of channels run 20-100x the magnitude of the rest and
per-TOKEN dynamic activation quantization collapses everyone else's
resolution — and measures how each int8 tier's anomaly maps degrade
relative to the bf16 pipeline, with and without the SmoothQuant-style
'+smooth' mitigation (ops/quant.py: calibrated per-channel scale folding
into the LN gain/bias and weight rows — exact in float, zero runtime cost).

Outliers are injected into the LayerNorm gains (a fixed channel set across
all layers, the empirically observed pattern): post-LN activations at the
qkv and c_fc inputs then carry the same outlier channels, exactly the
tensors int8_linear quantizes per token.

Metrics per (factor, tier): anomaly-map Spearman rho vs the bf16 fp
pipeline ON THE SAME (outlier-injected) WEIGHTS, max relative image-score
delta, and pixel-AUROC delta against synthetic ground-truth masks.

Run (CPU sanity, ~2 min):
    python tools/int8_outlier_study.py --size tiny
Run (flagship ViT-L @518 on the TPU chip; 4 remote compiles, budget ~30 min):
    python tools/int8_outlier_study.py --size flagship

Results + the go/no-go rule for making int8 the serving default live in
docs/DESIGN.md ("int8 outlier robustness").
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_images(n: int, size: int, seed: int):
    """In-memory synthetic eval batch: textured images, half with painted
    blob defects + masks (data/synthetic.py machinery, no disk)."""
    import numpy as np

    from aa_clip_iqm_tpu.data.datasets import normalize_clip
    from aa_clip_iqm_tpu.data.synthetic import _paint_defect, _texture

    rng = np.random.default_rng(seed)
    images, masks = [], []
    for i in range(n):
        img = _texture(rng, size, rng.uniform(60, 180, 3))
        mask = np.zeros((size, size), np.uint8)
        if i >= n // 2:
            img, mask = _paint_defect(rng, img, size)
        chw = np.transpose(img, (2, 0, 1)).astype(np.float32) / 255.0
        images.append(normalize_clip(chw))
        masks.append(mask > 0)
    return np.stack(images), np.stack(masks)


def inject_ln_gain_outliers(frozen, channels, factor: float):
    """Scale the given LN gain channels by `factor` in every block (ln_1 and
    ln_2) — the same fixed channel set across layers, as observed in real
    transformer checkpoints."""
    import jax.numpy as jnp
    import numpy as np

    if factor == 1.0:
        return frozen

    def boost(ln):
        scale = np.asarray(ln["scale"], np.float32).copy()
        scale[..., list(channels)] *= factor
        return dict(ln, scale=jnp.asarray(scale))

    blocks = dict(frozen["visual"]["blocks"])
    blocks["ln_1"] = boost(blocks["ln_1"])
    blocks["ln_2"] = boost(blocks["ln_2"])
    return dict(frozen, visual=dict(frozen["visual"], blocks=blocks))


def pixel_auroc(maps, masks) -> float:
    import numpy as np
    from scipy import stats

    scores = np.asarray(maps, np.float32).ravel()
    labels = np.asarray(masks).ravel().astype(bool)
    n_pos, n_neg = labels.sum(), (~labels).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    ranks = stats.rankdata(scores)
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2)
                 / (n_pos * n_neg))


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--size", choices=["tiny", "flagship"], default="tiny",
                   help="tiny: CPU-sized sanity model; flagship: ViT-L @518 "
                   "(run on the TPU chip)")
    p.add_argument("--factors", default="1,20,100",
                   help="comma list of LN-gain outlier factors (1 = control)")
    p.add_argument("--frac", type=float, default=0.002,
                   help="fraction of width channels made outliers (>=1 chan)")
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--alpha", type=float, default=0.5,
                   help="SmoothQuant migration strength")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_pallas", action="store_true",
                   help="route the fused kernels (TPU only)")
    p.add_argument("--tiers",
                   default="int8,int8+smooth,int8_attn,int8_attn+smooth,"
                           "int8_mlp,int8_mlp+smooth",
                   help="comma list of quant tiers to measure; '+smooth' "
                   "tiers need the calibration forward (skipped with a "
                   "note if its compile cannot complete)")
    args = p.parse_args()

    import jax

    if args.size == "tiny" or os.environ.get("AACLIP_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from scipy import stats as sps

    from aa_clip_iqm_tpu.evaluation.predict import make_predict_fn
    from aa_clip_iqm_tpu.loader import build_model_config
    from aa_clip_iqm_tpu.models import adapters as adapters_mod
    from aa_clip_iqm_tpu.models.clip import init_clip_params
    from aa_clip_iqm_tpu.ops.quant import (
        calibrate_ln_amax,
        quantize_backbone_tier,
    )

    if args.size == "flagship":
        img = 518
        cfg = build_model_config(img_size=img)
        compute_dtype = jnp.bfloat16
    else:
        from aa_clip_iqm_tpu.configs import tiny_test_config

        img = 56
        cfg = tiny_test_config(img)
        compute_dtype = jnp.float32

    rng = np.random.default_rng(args.seed)
    frozen0 = init_clip_params(jax.random.PRNGKey(args.seed), cfg.clip)
    trainable = adapters_mod.init_adapter_params(
        jax.random.PRNGKey(args.seed + 1), cfg)
    width = cfg.clip.vision.width
    n_out = max(1, int(round(args.frac * width)))
    channels = rng.choice(width, size=n_out, replace=False)
    print(f"# model={args.size} width={width} outlier_channels="
          f"{sorted(channels.tolist())}", flush=True)

    images_np, masks = make_images(args.images, img, args.seed + 7)
    images = jnp.asarray(images_np)
    anchors = rng.standard_normal(
        (args.images, cfg.clip.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    anchors = jnp.asarray(anchors)

    predict = make_predict_fn(cfg, img, "Industrial",
                              compute_dtype=compute_dtype,
                              use_pallas=args.use_pallas)

    def run(frozen_x):
        maps, scores = predict(frozen_x, trainable, images, anchors)
        return np.asarray(maps, np.float32), np.asarray(scores, np.float32)

    tiers = [t.strip() for t in args.tiers.split(",") if t.strip()]
    need_stats = any(t.endswith("+smooth") for t in tiers)

    hdr = (f"{'factor':>6} {'tier':>16} {'rho_vs_bf16':>11} "
           f"{'score_maxrel':>12} {'dAUROC_pts':>10}")
    print(hdr, flush=True)
    for factor in [float(f) for f in args.factors.split(",")]:
        frozen = inject_ln_gain_outliers(frozen0, channels, factor)
        # bf16 reference first: the predict-program compile is the known-
        # feasible one; calibration (a separate, larger stats-forward
        # compile that has been observed to outlive the remote tunnel's
        # connection lifetime) is attempted lazily and non-fatally so the
        # plain-tier rows always land.
        maps_ref, scores_ref = run(frozen)
        auroc_ref = pixel_auroc(maps_ref, masks)
        stats = None
        if need_stats:
            try:
                stats = calibrate_ln_amax(
                    frozen["visual"], cfg.clip.vision, images,
                    act_name=cfg.clip.act, compute_dtype=compute_dtype,
                    use_pallas=args.use_pallas)
                ratio = float(np.max(stats["qkv"]) /
                              max(np.median(stats["qkv"]), 1e-9))
                print(f"# factor={factor:g}: qkv-input amax max/median = "
                      f"{ratio:.1f}", flush=True)
            except Exception as exc:
                print(f"# factor={factor:g}: calibration failed ({exc}); "
                      "skipping ratio + '+smooth' tiers", flush=True)
        for tier in tiers:
                smooth = tier.endswith("+smooth")
                if smooth and stats is None:
                    print(f"{factor:>6g} {tier:>16} SKIPPED: no calibration",
                          flush=True)
                    continue
                try:
                    q = quantize_backbone_tier(
                        frozen, tier,
                        smooth_stats=stats if smooth else None,
                        smooth_alpha=args.alpha)
                    maps_q, scores_q = run(q)
                except Exception as exc:  # keep the sweep's partial table
                    print(f"{factor:>6g} {tier:>16} FAILED: {exc}",
                          flush=True)
                    continue
                rho = sps.spearmanr(maps_ref.ravel(),
                                    maps_q.ravel()).statistic
                srel = float(np.max(np.abs(scores_q - scores_ref))
                             / max(np.max(np.abs(scores_ref)), 1e-9))
                dauc = (pixel_auroc(maps_q, masks) - auroc_ref) * 100
                print(f"{factor:>6g} {tier:>16} {rho:>11.5f} "
                      f"{srel:>12.4f} {dauc:>+10.3f}", flush=True)


if __name__ == "__main__":
    main()
