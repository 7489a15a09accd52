#!/usr/bin/env bash
# Full train + eval sweep (the reference's scripts.sh:1-9 equivalent):
# train once full-shot, then evaluate across all datasets.
set -euo pipefail

save_path="${SAVE_PATH:-./ckpt/baseline}"
train_dataset="${TRAIN_DATASET:-VisA}"

python train.py --save_path "$save_path" --dataset "$train_dataset" \
    --training_mode full_shot "$@"

datasets=(MVTec BTAD MPDD Brain Liver Retina Colon_clinicDB Colon_colonDB \
          Colon_Kvasir Colon_cvc300)
for ds in "${datasets[@]}"; do
    python test.py --save_path "$save_path" --dataset "$ds"
done
