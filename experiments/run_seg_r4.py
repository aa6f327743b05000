"""Round-3 flagship quality push: 2× corpus + 2× epochs, same recipe.

The shipped flagship (seg_unetplusplus_resnet34.npz) came from a 60-epoch
run on a 960-image procedural corpus (commit ba5c8af; held-out raw IoU
0.776, docs/QUALITY.md). This run keeps the exact recipe (CombinedLoss,
batch 32 + remat, device-resident corpus, Adam + plateau) and scales the
two levers that are actually cheap on this stack now that epochs take
~10-30 s: corpus 960 -> 2048 triads (from 512 procedural clean sources +
32 logos, seeds disjoint from the reserved held-out 7700/7701) and
epochs 60 -> 120.

Stage 1 (this script): generate the corpus.
Stage 2 (shell): main.py train with the recipe opts (see __doc__ bottom).
Stage 3: scripts/quality_report.eval_segmentation on the new best_model
         vs the shipped weights; ship only if the frozen protocol improves.

Stage-2 command:
  python main.py train -c unet_watermark_tpu/configs/unet_watermark.yaml \
    --data-dir workspace/seg_r4/train --epochs 120 --batch-size 32 \
    --checkpoint-dir workspace/seg_r4/ckpt \
    --model-save-path workspace/seg_r4/unet_watermark.pth \
    --opts LOSS.NAME CombinedLoss MODEL.REMAT true \
           TRAIN.OUTPUT_DIR workspace/seg_r4/out TRAIN.SAVE_INTERVAL 30 \
           TRAIN.EARLY_STOPPING_PATIENCE 15
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/root/repo/workspace/seg_r4"
N_CLEAN = 512
N_TRIADS = 2048
CLEAN_SEED = 400      # disjoint from held-out protocol seeds 7700/7701
COMPOSE_SEED = 410


def main():
    from unet_watermark_tpu.data.gen_data import generate_dataset
    from unet_watermark_tpu.data.synth_clean import (
        generate_clean_dataset, generate_logo_set)

    clean_src = os.path.join(WORK, "clean_src")
    logos = os.path.join(WORK, "logos")
    n = generate_clean_dataset(clean_src, count=N_CLEAN, size=512,
                               seed=CLEAN_SEED)
    print(f"clean sources: +{n}")
    generate_logo_set(logos, count=32, seed=CLEAN_SEED + 1)
    stats = generate_dataset(clean_src, os.path.join(WORK, "train"),
                             logos_dir=logos, count=N_TRIADS,
                             seed=COMPOSE_SEED)
    print("train corpus:", stats)


if __name__ == "__main__":
    main()
