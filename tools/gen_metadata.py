#!/usr/bin/env python
"""Dataset metadata generator: produce the JSONL files the data layer reads.

The reference ships pre-built metadata (dataset/metadata/*/full-shot.jsonl,
11 datasets / 14,149 rows; row schema README.md:29-33: {image_path, label,
class_name, mask_path}). This tool regenerates such files from a dataset on
disk, and derives k-shot subsets, so no opaque metadata needs to be vendored.

Usage:
  # MVTec-style layout (<class>/test/<defect>/x.png + ground_truth masks):
  python tools/gen_metadata.py scan-mvtec --data_root ./data/MVTec-AD \
      --out dataset_metadata/MVTec/full-shot.jsonl

  # Flat layout (images dir + masks dir with matching stems):
  python tools/gen_metadata.py scan-flat --images imgs/ --masks masks/ \
      --class_name Brain --out dataset_metadata/Brain/full-shot.jsonl

  # k-shot subset of an existing full-shot file:
  python tools/gen_metadata.py subset --full full-shot.jsonl --shot 32 \
      --out 32-shot.jsonl --seed 111
"""
from __future__ import annotations

import argparse
import json
import os
import random
from collections import defaultdict

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".JPG", ".PNG"}


def _write(rows, out):
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(rows)} rows to {out}")


def _is_image(name):
    return os.path.splitext(name)[1] in IMG_EXTS


def scan_mvtec(data_root: str, out: str, split: str = "test",
               good_name: str = "good", mask_dir: str = "ground_truth",
               mask_suffix: str = "_mask"):
    """MVTec-AD/MPDD/BTAD-style layout:
    <class>/<split>/<defect>/img.png; masks at
    <class>/<mask_dir>/<defect>/img<mask_suffix>.png (absent for good)."""
    rows = []
    for class_name in sorted(os.listdir(data_root)):
        split_dir = os.path.join(data_root, class_name, split)
        if not os.path.isdir(split_dir):
            continue
        for defect in sorted(os.listdir(split_dir)):
            ddir = os.path.join(split_dir, defect)
            if not os.path.isdir(ddir):
                continue
            for fn in sorted(os.listdir(ddir)):
                if not _is_image(fn):
                    continue
                rel = f"{class_name}/{split}/{defect}/{fn}"
                row = {"image_path": rel, "label": 0, "class_name": class_name}
                if defect != good_name:
                    stem, ext = os.path.splitext(fn)
                    candidates = [
                        f"{class_name}/{mask_dir}/{defect}/{stem}{mask_suffix}{ext}",
                        f"{class_name}/{mask_dir}/{defect}/{stem}{mask_suffix}.png",
                        f"{class_name}/{mask_dir}/{defect}/{fn}",
                    ]
                    mask_rel = next(
                        (c for c in candidates
                         if os.path.isfile(os.path.join(data_root, c))), None)
                    if mask_rel is None:
                        print(f"warning: no mask for {rel}; skipping")
                        continue
                    row["label"] = 1
                    row["mask_path"] = mask_rel
                rows.append(row)
    _write(rows, out)


def scan_visa(data_root: str, out: str):
    """VisA official layout (VisA_20220922):
    <class>/Data/Images/{Normal,Anomaly}/x.JPG with masks at
    <class>/Data/Masks/Anomaly/x.png."""
    rows = []
    for class_name in sorted(os.listdir(data_root)):
        img_root = os.path.join(data_root, class_name, "Data", "Images")
        if not os.path.isdir(img_root):
            continue
        for kind in ("Normal", "Anomaly"):
            kdir = os.path.join(img_root, kind)
            if not os.path.isdir(kdir):
                continue
            for fn in sorted(os.listdir(kdir)):
                if not _is_image(fn):
                    continue
                rel = f"{class_name}/Data/Images/{kind}/{fn}"
                row = {"image_path": rel, "label": 0, "class_name": class_name}
                if kind == "Anomaly":
                    stem = os.path.splitext(fn)[0]
                    mask_rel = f"{class_name}/Data/Masks/Anomaly/{stem}.png"
                    if not os.path.isfile(os.path.join(data_root, mask_rel)):
                        print(f"warning: no mask for {rel}; skipping")
                        continue
                    row["label"] = 1
                    row["mask_path"] = mask_rel
                rows.append(row)
    _write(rows, out)


def scan_flat(images: str, out: str, class_name: str, masks: str = None,
              data_root: str = None):
    """Flat layout: every image in `images`; a sample is anomalous iff a
    non-empty mask with the same stem exists in `masks`. Paths in the output
    are relative to data_root (default: common parent)."""
    data_root = data_root or os.path.dirname(os.path.abspath(images.rstrip("/")))
    rows = []
    mask_index = {}
    if masks and os.path.isdir(masks):
        for fn in os.listdir(masks):
            if _is_image(fn):
                mask_index[os.path.splitext(fn)[0]] = fn
    for fn in sorted(os.listdir(images)):
        if not _is_image(fn):
            continue
        rel = os.path.relpath(os.path.join(images, fn), data_root)
        row = {"image_path": rel, "label": 0, "class_name": class_name}
        stem = os.path.splitext(fn)[0]
        if stem in mask_index:
            row["label"] = 1
            row["mask_path"] = os.path.relpath(
                os.path.join(masks, mask_index[stem]), data_root)
        rows.append(row)
    _write(rows, out)


def subset(full: str, out: str, shot: int, seed: int = 111,
           balance: bool = True):
    """Per-class k-shot subset: `shot` samples per class, half anomalous
    where available (training metadata for few-shot adaptation)."""
    by_class = defaultdict(lambda: {"0": [], "1": []})
    with open(full) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            by_class[row["class_name"]][str(row["label"])].append(row)
    rng = random.Random(seed)
    rows = []
    for class_name, groups in sorted(by_class.items()):
        normal, abnormal = groups["0"], groups["1"]
        if balance:
            n_abn = min(shot // 2, len(abnormal))
            n_norm = min(shot - n_abn, len(normal))
        else:
            n_abn, n_norm = 0, min(shot, len(normal))
        rows.extend(rng.sample(normal, n_norm))
        rows.extend(rng.sample(abnormal, n_abn))
    _write(rows, out)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("scan-mvtec")
    p.add_argument("--data_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--good_name", default="good")
    p.add_argument("--mask_dir", default="ground_truth")
    p.add_argument("--mask_suffix", default="_mask")

    p = sub.add_parser("scan-visa")
    p.add_argument("--data_root", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("scan-flat")
    p.add_argument("--images", required=True)
    p.add_argument("--masks", default=None)
    p.add_argument("--class_name", required=True)
    p.add_argument("--data_root", default=None)
    p.add_argument("--out", required=True)

    p = sub.add_parser("subset")
    p.add_argument("--full", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--shot", type=int, required=True)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--no_balance", action="store_true")

    args = parser.parse_args()
    if args.cmd == "scan-mvtec":
        scan_mvtec(args.data_root, args.out, args.split, args.good_name,
                   args.mask_dir, args.mask_suffix)
    elif args.cmd == "scan-visa":
        scan_visa(args.data_root, args.out)
    elif args.cmd == "scan-flat":
        scan_flat(args.images, args.out, args.class_name, args.masks,
                  args.data_root)
    elif args.cmd == "subset":
        subset(args.full, args.out, args.shot, args.seed,
               balance=not args.no_balance)


if __name__ == "__main__":
    main()
