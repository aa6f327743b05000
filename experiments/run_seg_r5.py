"""Round-4 seg corpus: the round-3 recipe's 2048 triads, now with the
textured clean tier mixed in 50/50 (texture_ratio=0.5) so the shipped
segmentation models train on the same natural-statistics distribution
the round-4 quality protocol scores (docs/QUALITY.md textured tier).

Seeds 500/510 — disjoint from the reserved protocol seeds
(7700/7701 smooth, 7800/7801 textured) and from every earlier training
lineage (42, 400/410, 55).

Stage 2 (shell) — batch-128 + remat + epoch-scan training run, which is
also the round-4 real-epoch throughput measurement (target >=150 img/s
at batch 128, VERDICT task 7):
  python main.py train -c unet_watermark_tpu/configs/unet_watermark.yaml \
    --data-dir workspace/seg_r5/train --epochs 120 --batch-size 128 \
    --model-save-path workspace/seg_r5/unet_watermark.pth \
    --opts LOSS.NAME CombinedLoss MODEL.REMAT true TRAIN.LOG_INTERVAL 0 \
           TRAIN.CHECKPOINT_DIR workspace/seg_r5/ckpt \
           TRAIN.OUTPUT_DIR workspace/seg_r5/out TRAIN.SAVE_INTERVAL 30 \
           TRAIN.EARLY_STOPPING_PATIENCE 15
Stage 3: quality_report eval on BOTH tiers vs the shipped weights; ship
only if the smooth tier holds and the textured tier improves.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/root/repo/workspace/seg_r5"
N_CLEAN = 512
N_TRIADS = 2048
CLEAN_SEED = 500
COMPOSE_SEED = 510


def main():
    from unet_watermark_tpu.data.gen_data import generate_dataset
    from unet_watermark_tpu.data.synth_clean import (
        generate_clean_dataset, generate_logo_set)

    clean_src = os.path.join(WORK, "clean_src")
    logos = os.path.join(WORK, "logos")
    n = generate_clean_dataset(clean_src, count=N_CLEAN, size=512,
                               seed=CLEAN_SEED, texture_ratio=0.5)
    print(f"clean sources: +{n}")
    generate_logo_set(logos, count=32, seed=CLEAN_SEED + 1)
    stats = generate_dataset(clean_src, os.path.join(WORK, "train"),
                             logos_dir=logos, count=N_TRIADS,
                             seed=COMPOSE_SEED)
    print("train corpus:", stats)


if __name__ == "__main__":
    main()
