"""Full-loss-path hardware leg (round-4 VERDICT #5): run training at
384x512 with the LPIPS term ACTIVE, so the complete reference loss
(MSE + 0.05 * LPIPS, ``/root/reference/src/loss/loss_lpips.py:27-55``)
is exercised end to end on the chip — step time and device memory under
the VGG16 forward+backward at full resolution.

The image bundles no pretrained VGG, so the checkpoint is a synthesized
DETERMINISTIC state dict in the exact torch ``lpips``-package layout
(net.slice*.N.weight + lins.N.model.1.weight), flowed through the real
conversion CLI (``scripts/convert_weights.py``).  The loss value is not
perceptually meaningful with random VGG weights, but the compute path,
memory footprint, and JSONL metrics plumbing are exactly the production
ones.

Usage:
  python -m freesplat_tpu.scripts.lpips_leg [--steps 30]
      [--image-shape 384,512] [--out outputs/lpips_leg]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

# VGG16 conv indices within each lpips ``net.slice{i}`` submodule (the
# torch layout convert_lpips_vgg consumes; see utils/torch_convert.py).
_VGG16_CONV_IDX = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]


def synthesize_lpips_pth(path: Path, seed: int = 1) -> None:
    import torch

    rng = np.random.default_rng(seed)
    sd = {}
    chans = [(3, 64, 64), (64, 128, 128), (128, 256, 256, 256),
             (256, 512, 512, 512), (512, 512, 512, 512)]
    for bi, conv_ids in enumerate(_VGG16_CONV_IDX):
        io = chans[bi]
        for ci, idx in enumerate(conv_ids):
            # He-scaled so activations stay finite through 13 conv layers.
            fan_in = io[ci] * 9
            sd[f"net.slice{bi + 1}.{idx}.weight"] = torch.from_numpy(
                (rng.normal(size=(io[ci + 1], io[ci], 3, 3))
                 * np.sqrt(2.0 / fan_in)).astype(np.float32)
            )
            sd[f"net.slice{bi + 1}.{idx}.bias"] = torch.zeros(io[ci + 1])
    for li, c in enumerate([64, 128, 256, 512, 512]):
        sd[f"lins.{li}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 1, size=(1, c, 1, 1)).astype(np.float32)
        )
    torch.save(sd, path)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--image-shape", default="384,512")
    p.add_argument("--out", default="outputs/lpips_leg")
    args = p.parse_args(argv)
    h, w = (int(x) for x in args.image_shape.split(","))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    pth = out / "lpips_synthetic.pth"
    npz = out / "lpips_synthetic.npz"
    synthesize_lpips_pth(pth)
    from .convert_weights import main as convert

    convert(["lpips", str(pth), str(npz)])

    from ..main import main as cli

    cli(
        [
            "dataset.name=synthetic",
            f"dataset.image_shape=[{h},{w}]",
            "dataset.synthetic_cache_batches=1",
            f"trainer.max_steps={args.steps + 1}",
            "trainer.val_check_interval=100000000",
            "trainer.log_every=5",
            f"optimizer.max_steps={args.steps + 1}",
            "optimizer.warm_up_steps=5",
            "loss.lpips.weight=0.05",
            "loss.lpips.apply_after_step=0",
            f"loss.lpips.weights_path={npz}",
            f"checkpointing.output_dir={out}/ckpt",
            "checkpointing.every_n_train_steps=100000000",
        ]
    )
    # The trainer logs to outputs/local/metrics.jsonl; copy the tail (this
    # run's steps, loss_lpips included) next to the evidence.
    src = Path("outputs/local/metrics.jsonl")
    if src.exists():
        lines = src.read_text().strip().splitlines()
        (out / "metrics_tail.jsonl").write_text(
            "\n".join(lines[-(args.steps + 5):]) + "\n"
        )

    # Record device memory after the run.
    import jax

    stats = {}
    try:
        stats = dict(jax.local_devices()[0].memory_stats() or {})
    except Exception:
        pass
    (out / "memory.json").write_text(json.dumps(stats, indent=2, default=int))
    print("peak_bytes_in_use:", stats.get("peak_bytes_in_use"))


if __name__ == "__main__":
    main()
