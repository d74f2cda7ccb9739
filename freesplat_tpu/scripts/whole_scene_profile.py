"""Per-phase attribution of the whole-scene 30-view encoder (VERDICT r3
weak #1: 82.7 s/scene measured vs ~20 s analytic floor — find where the
time goes before attacking it).

Drives ``make_chunked_encode`` directly (no decode/metrics) on a synthetic
30-view trajectory, twice: the first pass includes compiles, the second is
the warm number the benchmark reports.  Phase marks fence with a
``device_get`` (docs/PERFORMANCE.md: ``block_until_ready`` does not
reliably block on the axon tunnel).

Usage:
  python -m freesplat_tpu.scripts.whole_scene_profile \
      [--views 30] [--image-shape 384,512] [--chunk 6] [--reps 2]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--views", type=int, default=30)
    p.add_argument("--image-shape", default="384,512")
    p.add_argument("--chunk", type=int, default=15)  # r5 A/B: 15 beat 6 by 0.56 s/scene (docs/PERFORMANCE.md ROUND 5)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--depth-candidates", type=int, default=128)
    p.add_argument(
        "--override", action="append", default=[],
        help="extra dotted config overrides (e.g. "
             "encoder.compute_dtype=bfloat16) for A/B sweeps",
    )
    args = p.parse_args(argv)
    h, w = (int(x) for x in args.image_shape.split(","))

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ..config.config import load_config
    from ..data.synthetic import SyntheticCfg, synthetic_batches
    from ..evaluation.harness import make_chunked_encode
    from ..models.encoder import EncoderFreeSplat
    from ..training.trainer import TrainCfg, init_state

    cfg = load_config(
        [
            "dataset.name=synthetic",
            f"dataset.image_shape=[{h},{w}]",
            f"dataset.num_context_views={args.views}",
            f"encoder.num_depth_candidates={args.depth_candidates}",
            "encoder.num_views=5",
        ]
        + list(args.override)
    )
    t_gen = time.perf_counter()
    batch = next(
        synthetic_batches(
            SyntheticCfg(
                image_shape=(h, w), num_context=args.views, num_target=1,
                renderer="tile",  # datagen is not part of the timed encode
            )
        )
    )
    context = {k: v for k, v in batch["context"].items() if k != "test_fvs"}
    print(f"data gen: {time.perf_counter() - t_gen:.1f} s", flush=True)

    encoder = EncoderFreeSplat(dataclasses.replace(cfg.encoder, train_bn=False))
    train_cfg = TrainCfg(
        encoder=cfg.encoder, decoder=cfg.decoder,
        loss=cfg.loss, optimizer=cfg.optimizer,
    )
    state = init_state(train_cfg, jax.random.PRNGKey(0), batch)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    # ONE encode reused across reps — re-creating make_chunked_encode per
    # scene hands jax fresh jit callables (full retrace + compile-cache
    # round trip, ~30 s on the trunk graph alone), which is exactly the
    # per-scene bug 254bd56 fixed in run_test.  Steady-state is what the
    # benchmark (run_test over many scenes) pays.
    timings: dict = {}
    encode = make_chunked_encode(
        encoder, variables, args.chunk, timings=timings
    )
    for rep in range(args.reps):
        timings.clear()
        t0 = time.perf_counter()
        out = encode(context)
        jax.device_get(out["num_gaussians"])
        total = time.perf_counter() - t0
        # Flatten cumulative marks into per-phase deltas.
        marks = sorted(
            ((ts[0], k) for k, ts in timings.items()),
        )
        deltas = {}
        prev = marks[0][0]
        for ts, k in marks[1:]:
            deltas[k] = round(ts - prev, 3)
            prev = ts
        deltas["tail(head->host)"] = round(t0 + total - prev, 3)
        label = "cold" if rep == 0 else f"warm{rep}"
        print(f"[{label}] total {total:.2f} s")
        print(json.dumps(deltas, indent=2), flush=True)


if __name__ == "__main__":
    main()
