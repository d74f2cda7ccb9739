"""Validation loop: render one scene, log metrics + comparison grids.

Parity target: ``ModelWrapper.validation_step``
(``src/model/model_wrapper.py:507-637``) — renders the target views of a
random validation scene, logs PSNR and a context|gt|prediction image
grid, and appends a line to ``val_metrics.txt`` (``:640-652``).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..models.decoder import DecoderCfg, render_views
from ..models.encoder import EncoderFreeSplat, EncoderFreeSplatCfg
from ..training.metrics import compute_psnr
from ..utils.visualization import add_label, hcat, vcat


def validation_step(
    encoder_cfg: EncoderFreeSplatCfg,
    decoder_cfg: DecoderCfg,
    variables: dict,
    batch: dict,
    step: int,
    output_dir: str | Path = "outputs/local",
    save_video: bool = False,
    save_projections: bool = False,
) -> dict[str, float]:
    import dataclasses

    # The reference applies set_bn_eval (train-mode BN -> batch
    # statistics) in EVERY forward, validation included
    # (encoder_freesplat.py:216); keep validation in the same regime as
    # the test harness default (+1.47 dB measured, see TestCfg).
    encoder = EncoderFreeSplat(
        dataclasses.replace(encoder_cfg, train_bn=True)
    )
    context = {k: v for k, v in batch["context"].items() if k != "test_fvs"}
    target = batch["target"]
    h, w = target["image"].shape[2:4]

    results, _ = encoder.apply(variables, context, mutable=["batch_stats"])
    out = render_views(
        decoder_cfg,
        results["gaussians"],
        target["extrinsics"],
        target["intrinsics"],
        target["near"],
        target["far"],
        (h, w),
    )
    pred = np.asarray(out.color[0])
    gt = np.asarray(target["image"][0])
    psnr = float(np.mean(np.asarray(compute_psnr(gt, pred))))

    # Comparison grid: context row | gt row | prediction row.
    ctx_row = hcat(*[np.asarray(im) for im in context["image"][0]])
    gt_row = hcat(*list(gt))
    pred_row = hcat(*list(pred))
    grid = vcat(
        add_label(ctx_row, "Context"),
        add_label(gt_row, "Target (Ground Truth)"),
        add_label(pred_row, "Target (Prediction)"),
    )

    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
        out_dir / f"val_{step:0>7}.png"
    )
    with (out_dir / "val_metrics.txt").open("a") as f:
        scene = batch.get("scene", ["?"])[0]
        f.write(f"step {step} scene {scene} psnr {psnr:.4f}\n")

    if save_projections:
        # Encoder summaries (reference encoder_visualizer_epipolar.py:
        # 177-275): depth/disparity panels + gaussian opacity/color/
        # covariance panels.
        from ..utils.encoder_visualizer import (
            visualize_depth,
            visualize_epipolar_samples,
            visualize_gaussians,
        )

        depth_panel = visualize_depth(context, results["depth_s-1"])
        g = results["gaussians"]
        gauss_panel = visualize_gaussians(
            np.asarray(context["image"]),
            np.asarray(g.opacities),
            np.asarray(g.covariances),
            np.asarray(g.harmonics[..., 0] * 0.28209479177387814 + 0.5),
        )
        epipolar_panel = visualize_epipolar_samples(context, seed=step)
        for name, panel in (
            ("depth", depth_panel), ("gaussians", gauss_panel),
            ("epipolar", epipolar_panel),
        ):
            Image.fromarray(
                (np.clip(panel, 0, 1) * 255).astype(np.uint8)
            ).save(out_dir / f"val_{step:0>7}_{name}.png")

        # 3D validation renders: axis-aligned orthographic projections of
        # the predicted Gaussians (reference validation_in_3d.py via
        # model_wrapper.py:591-607).
        from ..models.render_extras import render_projections

        g0 = jax.tree_util.tree_map(lambda x: x[0], results["gaussians"])
        projections = np.asarray(render_projections(g0, resolution=256))
        proj_grid = hcat(
            *[
                add_label(projections[i], f"{'XYZ'[(i + 1) % 3]}"
                          f"{'XYZ'[(i + 2) % 3]} Projection")
                for i in range(3)
            ]
        )
        Image.fromarray(
            (np.clip(proj_grid, 0, 1) * 255).astype(np.uint8)
        ).save(out_dir / f"val_{step:0>7}_projections.png")

        # Camera-frustum wireframes (reference render_cameras,
        # validation_in_3d.py:92-121: context white, target red).
        from ..utils.camera_viz import render_cameras

        cams = render_cameras(batch, resolution=256)
        cam_grid = hcat(*list(cams))
        Image.fromarray(
            (np.clip(cam_grid, 0, 1) * 255).astype(np.uint8)
        ).save(out_dir / f"val_{step:0>7}_cameras.png")

    if save_video:
        # Trajectory videos, as the reference logs during validation
        # (model_wrapper.py:654-819: wobble + context interpolation).
        from ..evaluation.video import (
            render_video_interpolation,
            render_video_wobble,
        )

        vid_args = (
            decoder_cfg,
            results["gaussians"],
            context["extrinsics"][0],
            context["intrinsics"][0],
            float(np.asarray(context["near"])[0, 0]),
            float(np.asarray(context["far"])[0, 0]),
            (h, w),
        )
        render_video_wobble(
            *vid_args, out_dir / f"val_{step:0>7}_wobble.mp4"
        )
        render_video_interpolation(
            *vid_args, out_dir / f"val_{step:0>7}_interpolation.mp4"
        )
    return {"psnr": psnr}
