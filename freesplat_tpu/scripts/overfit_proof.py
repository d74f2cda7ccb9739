"""Overfit-one-scene quality proof at full resolution (384x512).

Trains the full pipeline from scratch on ONE synthetic multi-view scene
through the real CLI path (mode=train equivalent), then evaluates the
final checkpoint through the test harness and writes the evidence
(stats.json + summary) under ``--out``.

The reference's debugging analog is overfit_to_scene
(``src/dataset/dataset_scannet.py:75-77``); the acceptance bar (round-2
VERDICT) is PSNR >= 35 at 384x512 with gs_ratio < 1 on overlapping
views.  Targets interpolate between the context views (bounded-sampler
protocol) — extrapolated targets see regions no context ray covers and
cap achievable PSNR (see docs/PERFORMANCE.md).

Usage:
  python -m freesplat_tpu.scripts.overfit_proof \
      [--steps 5000] [--out outputs/overfit384] [--image-shape 384,512]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--out", default="outputs/overfit384")
    p.add_argument("--image-shape", default="384,512")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--val-every", type=int, default=1000)
    args = p.parse_args(argv)

    h, w = (int(x) for x in args.image_shape.split(","))
    out = Path(args.out)
    ckpt = out / "ckpt"

    from ..main import main as cli
    from ..training.checkpoint import latest_step

    overrides = [
        "dataset.name=synthetic",
        f"dataset.image_shape=[{h},{w}]",
        "dataset.synthetic_cache_batches=1",
        f"trainer.max_steps={args.steps + 1}",
        f"trainer.val_check_interval={args.val_every}",
        "trainer.log_every=100",
        f"optimizer.max_steps={args.steps + 1}",
        "optimizer.warm_up_steps=200",
        f"optimizer.lr={args.lr}",
        "optimizer.gradient_clip_val=1.0",  # reference's 0.01 cripples
        f"checkpointing.output_dir={ckpt}",
        f"checkpointing.every_n_train_steps={args.val_every}",
    ]
    # Resume an interrupted proof run: the trainer restores params,
    # optimizer state, AND the step counter, so fit continues from the
    # last saved step (synthetic batches are seed-deterministic).
    if latest_step(str(ckpt)) is not None:
        overrides.append(f"checkpointing.load={ckpt}")
    cli(overrides)

    # Evaluate the trained checkpoint through the test harness on the
    # SAME cached scene (synthetic generators are seed-deterministic).
    cli(
        [
            "mode=test",
            "dataset.name=synthetic",
            f"dataset.image_shape=[{h},{w}]",
            "dataset.synthetic_cache_batches=1",
            "test.max_scenes=1",
            f"checkpointing.load={ckpt}",
            f"test.output_path={out}/test",
        ]
    )
    stats = json.loads((out / "test" / "stats.json").read_text())
    print(json.dumps(stats["summary"], indent=2))


if __name__ == "__main__":
    main()
