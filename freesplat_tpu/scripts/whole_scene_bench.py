"""Whole-scene 30-view benchmark on one chip (BASELINE config 5's
single-chip half; reference protocol:
``assets/evaluation_index_scannet_30views.json`` + chunked rendering,
``src/model/model_wrapper.py:336-353``).

Drives the real test harness over a synthetic 30-context-view loop
trajectory at the fvt preset's model shape (num_views=5 nearest-k,
D=128), recording encoder s/scene, decoder s/view, gs_ratio, fused
Gaussian count, and device peak memory.

Usage:
  python -m freesplat_tpu.scripts.whole_scene_bench \
      [--views 30] [--image-shape 384,512] [--out outputs/whole_scene30]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--views", type=int, default=30)
    p.add_argument("--targets", type=int, default=8)
    p.add_argument("--image-shape", default="384,512")
    p.add_argument("--out", default="outputs/whole_scene30")
    p.add_argument("--depth-candidates", type=int, default=128)
    # 2 scenes: the first call carries jit tracing + compile-cache loads;
    # the second is the warm number (the reference's CUDA benchmark is
    # warm after its first batch too).  benchmark.json keeps both.
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir for a trained-net run")
    args = p.parse_args(argv)
    h, w = (int(x) for x in args.image_shape.split(","))

    from ..config.config import load_config
    from ..data.synthetic import SyntheticCfg, synthetic_batches
    from ..evaluation.harness import run_test
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    overrides = [
        "dataset.name=synthetic",
        f"dataset.image_shape=[{h},{w}]",
        f"dataset.num_context_views={args.views}",
        f"encoder.num_depth_candidates={args.depth_candidates}",
        "encoder.num_views=5",  # fvt preset nearest-k (fvt.yaml)
        f"test.output_path={args.out}",
        "test.save_depth=false",
        # Single chip: host-chunked trunk (a monolithic 30-view encode
        # graph plans ~23 GB of HBM).
        "test.encode_view_chunk=15",  # r5 A/B (docs/PERFORMANCE.md ROUND 5)
        "test.render_capacity_factor=1.0",  # whole-scene: 553 vs 1560 ms/view
    ]
    if args.ckpt:
        overrides.append(f"checkpointing.load={args.ckpt}")
        overrides.append("checkpointing.strict=false")
    cfg = load_config(overrides)
    batches = synthetic_batches(
        SyntheticCfg(
            image_shape=(h, w),
            num_context=args.views,
            num_target=args.targets,
            renderer="tile",  # datagen is not part of the timed encode
            vary_scene=True,
        )
    )
    summary = run_test(cfg, batches=batches, max_scenes=args.scenes)
    print(json.dumps(summary, indent=2, default=float))
    bench = json.loads((Path(args.out) / "benchmark.json").read_text())
    peak = json.loads((Path(args.out) / "peak_memory.json").read_text())
    enc_s = bench.get("encoder", [None])
    print(
        f"views={args.views} {h}x{w}: encoder {enc_s} s/scene, "
        f"gs_ratio={summary.get('gs_ratio'):.4f}, "
        f"num_gaussians={summary.get('num_gaussians')}, peak={peak}"
    )


if __name__ == "__main__":
    main()
