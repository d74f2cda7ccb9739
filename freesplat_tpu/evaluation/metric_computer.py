"""Cross-method metric computation over dumped frames.

Parity target: ``src/evaluation/metric_computer.py:15-115`` — given
directories of rendered frames from multiple methods plus ground truth,
compute PSNR/SSIM (and LPIPS when weights are available) per method and
tabulate.  Frame layout: ``<root>/<method>/<scene>/color/<idx>.png`` with
ground truth dumped alongside as ``<idx>_gt.png`` (the layout our test
harness writes) or a dedicated gt method directory.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Sequence

import numpy as np
from PIL import Image

from ..training.metrics import compute_psnr, compute_ssim


@dataclass
class MethodCfg:
    name: str
    key: str  # directory name
    path: str


@dataclass
class MetricComputerCfg:
    methods: Sequence[MethodCfg] = ()
    output_path: str = "outputs/metrics"


def _load_frames(directory: Path, suffix: str = ".png", gt: bool = False):
    frames = {}
    for p in sorted(directory.glob(f"*{suffix}")):
        is_gt = p.stem.endswith("_gt")
        if is_gt != gt:
            continue
        key = p.stem.replace("_gt", "")
        frames[key] = np.asarray(Image.open(p)).astype(np.float32) / 255.0
    return frames


def compute_scene_metrics(
    method_dir: Path, lpips_params: Any = None
) -> dict[str, float] | None:
    """PSNR/SSIM (+LPIPS) for one method/scene directory of pred+gt dumps."""
    color_dir = method_dir / "color"
    if not color_dir.is_dir():
        color_dir = method_dir
    preds = _load_frames(color_dir, gt=False)
    gts = _load_frames(color_dir, gt=True)
    keys = sorted(set(preds) & set(gts))
    if not keys:
        return None
    pred = np.stack([preds[k] for k in keys])
    gt = np.stack([gts[k] for k in keys])
    out = {
        "psnr": float(np.mean(np.asarray(compute_psnr(gt, pred)))),
        "ssim": float(np.mean(np.asarray(compute_ssim(gt, pred)))),
        "num_frames": len(keys),
    }
    if lpips_params is not None:
        from ..training.lpips import LPIPS

        out["lpips"] = float(
            np.mean(np.asarray(LPIPS().apply(lpips_params, pred, gt)))
        )
    return out


def run_metric_computer(
    cfg: MetricComputerCfg, lpips_params: Any = None
) -> dict[str, dict[str, float]]:
    """Tabulate metrics across methods; dumps a JSON + prints a table."""
    table: dict[str, dict[str, float]] = {}
    for method in cfg.methods:
        root = Path(method.path) / method.key
        if not root.is_dir():
            root = Path(method.path)
        per_scene = []
        for scene_dir in sorted(p for p in root.iterdir() if p.is_dir()):
            m = compute_scene_metrics(scene_dir, lpips_params)
            if m is not None:
                per_scene.append(m)
        if not per_scene:
            continue
        weights = np.asarray([m["num_frames"] for m in per_scene], np.float64)
        agg = {}
        for key in per_scene[0]:
            if key == "num_frames":
                agg[key] = float(weights.sum())
                continue
            vals = np.asarray([m[key] for m in per_scene])
            agg[key] = float((vals * weights).sum() / weights.sum())
        table[method.name] = agg

    out_dir = Path(cfg.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    with (out_dir / "metrics.json").open("w") as f:
        json.dump(table, f, indent=2)

    if table:
        cols = [k for k in next(iter(table.values())) if k != "num_frames"]
        header = "method".ljust(24) + "".join(c.rjust(10) for c in cols)
        print(header)
        for name, agg in table.items():
            print(
                name.ljust(24)
                + "".join(f"{agg[c]:10.4f}" for c in cols)
            )
    return table
