"""Benchmark suite over the BASELINE configurations (synthetic inputs).

Prints one JSON line per benchmark:
  rasterize fwd / fwd+bwd (2-view Gaussian budget)
  encoder inference (ScanNet 2-view shapes)
  full train step (ScanNet 2-view / 3-view)

Run: ``python -m freesplat_tpu.scripts.bench_suite [raster] [encoder]
[train2] [train3]`` (no args = raster only; each benchmark compiles its
own graphs — expect minutes on first run, cached afterwards).

All timings use the honest device_get fence (utils/timing.bench) —
``block_until_ready`` does not reliably block on the axon tunnel; see
docs/PERFORMANCE.md methodology.
"""
from __future__ import annotations

import json
import sys

import numpy as np


def _pipelined(fn, *args, reps: int = 8) -> float:
    from ..utils.timing import bench

    return bench(fn, [args], n=reps)


def _emit(metric: str, value: float, unit: str) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 2), "unit": unit}),
          flush=True)


def _scene(n, seed=0):
    import jax.numpy as jnp

    from ..ops.gaussians import build_covariance

    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        rng.uniform([-3, -3, 0.8], [3, 3, 10], size=(n, 3)), jnp.float32
    )
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cov = build_covariance(
        jnp.asarray(rng.uniform(0.005, 0.03, size=(n, 3)), jnp.float32),
        jnp.asarray(q, jnp.float32),
    )
    harm = jnp.asarray(rng.normal(size=(n, 3, 9)) * 0.3, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 1.0, size=n), jnp.float32)
    return means, cov, harm, opac


def _context(v, h, w, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    intr = np.zeros((1, v, 3, 3), np.float32)
    intr[..., 0, 0] = 1.07
    intr[..., 1, 1] = 1.42
    intr[..., 0, 2] = intr[..., 1, 2] = 0.5
    intr[..., 2, 2] = 1.0
    extr = np.tile(np.eye(4, dtype=np.float32), (1, v, 1, 1))
    for vi in range(v):
        extr[:, vi, 0, 3] = 0.2 * vi
    return {
        "image": jnp.asarray(rng.uniform(size=(1, v, h, w, 3)), jnp.float32),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
        "near": jnp.full((1, v), 0.5, jnp.float32),
        "far": jnp.full((1, v), 15.0, jnp.float32),
    }


def bench_raster() -> None:
    import jax
    import jax.numpy as jnp

    from ..ops.rasterizer import rasterize

    h, w = 384, 512
    n = 196608
    means, cov, harm, opac = _scene(n)
    extr = jnp.eye(4, dtype=jnp.float32)
    intr = jnp.array([[1.07, 0, 0.5], [0, 1.42, 0.5], [0, 0, 1]], jnp.float32)
    bg = jnp.zeros(3)
    f = jax.jit(
        lambda *a: rasterize(*a, extr, intr, (h, w), bg, 2, 2 * n)
    )
    dt = _pipelined(f, means, cov, harm, opac)
    _emit("raster_fwd", h * w / dt, "rays/s")
    g = jax.jit(
        jax.value_and_grad(
            lambda m, c, hh, o: jnp.mean(
                rasterize(m, c, hh, o, extr, intr, (h, w), bg, 2, 2 * n)[0] ** 2
            ),
            argnums=(0, 1, 2, 3),
        )
    )
    dt = _pipelined(g, means, cov, harm, opac)
    _emit("raster_fwd_bwd", h * w / dt, "rays/s")


def bench_encoder() -> None:
    import jax

    from ..models.adapter import GaussianAdapterCfg
    from ..models.encoder import EncoderFreeSplat, EncoderFreeSplatCfg

    cfg = EncoderFreeSplatCfg(
        num_depth_candidates=128, adapter=GaussianAdapterCfg(sh_degree=2),
        train_bn=False,
    )
    ctx = _context(2, 384, 512)
    enc = EncoderFreeSplat(cfg)
    variables = enc.init(jax.random.PRNGKey(0), ctx)
    f = jax.jit(lambda c: enc.apply(variables, c)["gaussians"].means)
    dt = _pipelined(f, ctx, reps=4)
    _emit("encoder_fwd_2view", dt * 1e3, "ms/scene")


def bench_train(views: int) -> None:
    import jax

    from ..models.adapter import GaussianAdapterCfg
    from ..models.decoder import DecoderCfg
    from ..models.encoder import EncoderFreeSplatCfg
    from ..training.losses import LossCfg, LossMseCfg
    from ..training.schedule import OptimizerCfg
    from ..training.trainer import TrainCfg, init_state, make_train_step

    cfg = TrainCfg(
        encoder=EncoderFreeSplatCfg(
            num_depth_candidates=128, num_views=views,
            adapter=GaussianAdapterCfg(sh_degree=2),
        ),
        decoder=DecoderCfg(sh_degree=2, capacity_factor=2),
        loss=LossCfg(mse=LossMseCfg(1.0), lpips=None),
        optimizer=OptimizerCfg(),
    )
    batch = {"context": _context(views, 384, 512), "target": _context(1, 384, 512, seed=1)}
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)

    def one(state):
        s, _ = step(state, batch)
        return s

    dt = _pipelined(jax.jit(one), state, reps=4)
    _emit(f"train_step_{views}view", dt * 1e3, "ms/step")


def bench_ptf(views: int = 2) -> None:
    import jax
    import jax.numpy as jnp

    from ..models.networks import GRU, positional_encoding
    from ..models.ptf import fuse_views

    h, w = 384, 512
    hw = h * w
    c = 64
    rng = np.random.default_rng(0)
    gru = GRU(hidden_channel=c)
    zf = jnp.zeros((1, c))
    ze = positional_encoding(jnp.zeros((1, 2)), 6)
    gvs = gru.init(jax.random.PRNGKey(0), zf, zf, ze, ze)
    gru_apply = lambda i, hh, ie, he: gru.apply(gvs, i, hh, ie, he)
    extr = np.tile(np.eye(4, dtype=np.float32), (views, 1, 1))
    extr[:, 0, 3] = 0.2 * np.arange(views)
    intr = np.tile(
        np.array([[1.07, 0, 0.5], [0, 1.42, 0.5], [0, 0, 1]], np.float32),
        (views, 1, 1),
    )
    args = (
        jnp.asarray(rng.standard_normal((views, hw, c)), jnp.float32),
        jnp.asarray(rng.uniform(-2, 2, (views, hw, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (views, hw, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (views, hw, 1)), jnp.float32),
        jnp.asarray(rng.uniform(1, 10, (views, hw)), jnp.float32),
    )
    f = jax.jit(
        lambda ft, co, de, wt, dp: fuse_views(
            ft, co, de, wt, dp, jnp.asarray(extr), jnp.asarray(intr),
            (h, w), gru_apply,
        ).feat
    )
    dt = _pipelined(f, *args, reps=4)
    _emit(f"ptf_fwd_{views}view", dt * 1e3, "ms")


def main() -> None:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    which = set(sys.argv[1:]) or {"raster"}
    if "raster" in which:
        bench_raster()
    if "encoder" in which:
        bench_encoder()
    if "ptf" in which:
        bench_ptf(2)
    if "train2" in which:
        bench_train(2)
    if "train3" in which:
        bench_train(3)


if __name__ == "__main__":
    main()
