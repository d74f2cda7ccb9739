"""Scaling-efficiency benchmark: rays/s at 1 device vs an N-device mesh.

BASELINE.md's scaling gate: >= 85% rays/s efficiency from 1 chip to a
v5e-16 slice.  On hardware with a single chip this still runs the full
sharded code path (mesh of 1); on a multi-chip slice it measures real ICI
scaling; `python -m freesplat_tpu.parallel.scaling_bench` prints one JSON
line per configuration.
"""
from __future__ import annotations

import json

import numpy as np


def build_scene(n: int, seed: int = 0):
    import jax.numpy as jnp

    from ..ops.gaussians import build_covariance

    rng = np.random.default_rng(seed)
    means = jnp.asarray(
        rng.uniform([-3, -3, 0.8], [3, 3, 10], size=(n, 3)), dtype=jnp.float32
    )
    scales = jnp.asarray(rng.uniform(0.005, 0.03, size=(n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cov = build_covariance(scales, jnp.asarray(q, jnp.float32))
    harm = jnp.asarray(rng.normal(size=(n, 3, 9)) * 0.3, jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 1.0, size=n), jnp.float32)
    return means, cov, harm, opac


def bench_mesh(
    n_devices: int,
    image_shape: tuple[int, int] = (384, 512),
    n_gaussians: int = 196608,
    reps: int = 8,
) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from .sharded_render import rasterize_sharded

    h, w = image_shape
    devices = np.asarray(jax.devices()[:n_devices])
    mesh = Mesh(devices, ("shard",))
    means, cov, harm, opac = build_scene(n_gaussians)
    extr = jnp.eye(4, dtype=jnp.float32)
    intr = jnp.array(
        [[1.07, 0, 0.5], [0, 1.42, 0.5], [0, 0, 1]], jnp.float32
    )
    bg = jnp.zeros(3)
    target = jnp.zeros((h, w, 3), jnp.float32)

    def loss(m, c, hh, o):
        color, _, _, stats = rasterize_sharded(
            m, c, hh, o, extr, intr, image_shape, bg, 2,
            mesh=mesh, capacity=2 * n_gaussians, return_stats=True,
        )
        return jnp.mean((color - target) ** 2), stats["dropped"]

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True))

    # The device-count-scaled slab budget must not silently shrink the
    # measured work: a benchmark that drops instances at N devices but
    # not at 1 would inflate "scaling efficiency".
    (_, dropped), _ = step(means, cov, harm, opac)
    assert int(dropped) == 0, (
        f"{int(dropped)} instances dropped at {n_devices} devices — raise "
        "per_device_capacity; the timing would not be comparable"
    )

    from ..utils.timing import bench

    dt = bench(
        lambda m: step(m, cov, harm, opac),
        [(means + 0.001 * i,) for i in range(3)],
        n=reps,
    )
    return {
        "devices": n_devices,
        "rays_per_s": h * w / dt,
        "ms_per_step": dt * 1e3,
    }


def main(argv: list[str] | None = None) -> None:
    import argparse

    from ..utils.cache import enable_compilation_cache

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--devices", type=int, nargs="*", default=None,
        help="device counts to bench (default: 1 and all available)",
    )
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--gaussians", type=int, default=196608)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args(argv)

    enable_compilation_cache()
    import jax

    n_avail = len(jax.devices())
    counts = args.devices or [1, n_avail]
    results = []
    for nd in counts:
        if nd > n_avail or (results and nd == results[-1]["devices"]):
            continue
        r = bench_mesh(
            nd, (args.height, args.width), args.gaussians, args.reps
        )
        results.append(r)
        print(json.dumps(r), flush=True)
    if len(results) >= 2:
        eff = results[-1]["rays_per_s"] / (
            results[0]["rays_per_s"]
            * results[-1]["devices"] / results[0]["devices"]
        )
        print(json.dumps({"scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
