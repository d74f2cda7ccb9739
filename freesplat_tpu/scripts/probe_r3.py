"""Round-3 hardware probes (single TPU chip, run SOLO).

1. Mosaic ``dynamic_gather`` feasibility/speed for deep tables — the
   fused plane-sweep kernel design hinges on cross-sublane gathers at
   table depth hw=12288 (``tpu.dynamic_gather`` via take_along_axis,
   jax/_src/pallas/mosaic/lowering.py:2464-2525).
2. Rasterizer DOT_PRECISION A/B (HIGH vs HIGHEST) + parity delta.
3. Honest cost-volume fwd/fwd+bwd re-profile (the round-2 table left
   134 ms vs ~60 ms unreconciled).

Usage: python -m freesplat_tpu.scripts.probe_r3 [gather|raster|sweep]
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.cache import enable_compilation_cache
from ..utils.timing import bench


def probe_gather():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for rows, lanes in [(8, 128), (128, 128), (1024, 128), (12288, 128),
                        (12288, 96), (12416, 192)]:
        def k(x_ref, idx_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(
                x_ref[...], idx_ref[...], axis=0
            )

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((rows, lanes)),
            jnp.float32,
        )
        idx = jnp.asarray(
            np.random.default_rng(1).integers(0, rows, (rows, lanes)),
            jnp.int32,
        )
        try:
            fn = jax.jit(
                lambda x, idx: pl.pallas_call(
                    k,
                    out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
                )(x, idx)
            )
            out = jax.device_get(fn(x, idx))
            ok = np.allclose(
                out, np.take_along_axis(np.asarray(x), np.asarray(idx), 0)
            )
            if not ok:
                print(f"gather ({rows},{lanes}): WRONG RESULT")
                continue
            ms = bench(fn, [(x, idx)] * 8) * 1e3
            el = rows * lanes
            print(
                f"gather ({rows},{lanes}): OK {ms:.3f} ms "
                f"({ms * 1e6 / el:.2f} ns/elem)"
            )
        except Exception as e:
            print(f"gather ({rows},{lanes}): FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}")


def probe_raster():
    import freesplat_tpu.ops.rasterizer as R
    from freesplat_tpu.ops.gaussians import build_covariance

    rng = np.random.default_rng(7)
    n = 393216
    h, w = 384, 512
    means = jnp.asarray(
        rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 4.0]), jnp.float32
    )
    scales = jnp.asarray(rng.uniform(0.004, 0.03, (n, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    cov = build_covariance(scales, quats)
    sh = jnp.asarray(rng.normal(size=(n, 3, 9)) * 0.3, jnp.float32)
    op = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(n,)), jnp.float32))
    extr = jnp.eye(4)
    intr = jnp.asarray(
        [[1.1, 0, 0.5], [0, 1.4667, 0.5], [0, 0, 1]], jnp.float32
    )
    bg = jnp.zeros((3,))

    def make_args(k):
        r2 = np.random.default_rng(100 + k)
        dm = jnp.asarray(r2.normal(size=(n, 3)) * 1e-3, jnp.float32)
        return (means + dm,)

    args_list = [make_args(k) for k in range(8)]

    results = {}
    for prec_name, prec in [
        ("DEFAULT", jax.lax.Precision.DEFAULT),
        ("HIGHEST", jax.lax.Precision.HIGHEST),
    ]:
        R.DOT_PRECISION = prec

        @jax.jit
        def fwd(m):
            c, d, a = R.rasterize(m, cov, sh, op, extr, intr, (h, w), bg, 2)
            return c, d, a

        @jax.jit
        def fwdbwd(m):
            def loss(m):
                c, d, a = R.rasterize(
                    m, cov, sh, op, extr, intr, (h, w), bg, 2
                )
                return jnp.sum(c) + 0.01 * jnp.sum(d)

            l, g = jax.value_and_grad(loss)(m)
            return l, g

        t_f = bench(fwd, args_list) * 1e3
        t_fb = bench(fwdbwd, args_list) * 1e3
        rays = h * w
        print(
            f"raster {prec_name}: fwd {t_f:.2f} ms, fwd+bwd {t_fb:.2f} ms "
            f"({rays / t_fb * 1000 / 1e6:.3f} Mrays/s fwd+bwd)"
        )
        results[prec_name] = (
            jax.device_get(fwd(means)[0]),
            jax.device_get(fwdbwd(means)[1]),
        )
    c_hi, g_hi = results["HIGHEST"]
    c_h, g_h = results["DEFAULT"]
    print(
        "parity DEFAULT vs HIGHEST: color max|d| ="
        f" {np.abs(c_hi - c_h).max():.3e}, grad max|d| ="
        f" {np.abs(g_hi - g_h).max():.3e},"
        f" grad rel = {np.abs(g_hi - g_h).max() / (np.abs(g_hi).max() + 1e-12):.3e}"
    )


def probe_sweep():
    from freesplat_tpu.models.cost_volume import CostVolume

    rng = np.random.default_rng(5)
    b, h, w, c, V, D = 2, 96, 128, 48, 1, 128
    cur = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((b, V, h, w, c)), jnp.float32)
    k44 = np.eye(4, dtype=np.float32)
    k44[0, 0] = w * 1.1
    k44[1, 1] = h * 1.4
    k44[0, 2] = w / 2
    k44[1, 2] = h / 2
    src_T_cur = np.tile(np.eye(4, dtype=np.float32), (b, V, 1, 1))
    src_T_cur[:, :, 0, 3] = 0.15
    mod = CostVolume(num_depth_bins=D)
    args = (
        cur, src, jnp.asarray(src_T_cur),
        jnp.asarray(np.tile(k44, (b, V, 1, 1))),
        jnp.asarray(np.tile(np.linalg.inv(k44), (b, 1, 1))),
        0.5, 15.0,
    )
    variables = mod.init(jax.random.PRNGKey(0), *args)

    @jax.jit
    def fwd(cur, src):
        return mod.apply(variables, cur, src, *args[2:])

    @jax.jit
    def fwdbwd(cur, src):
        def loss(cur, src):
            return jnp.sum(mod.apply(variables, cur, src, *args[2:]) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(cur, src)
        return l, g

    def mk(k):
        r2 = np.random.default_rng(200 + k)
        return (
            cur + jnp.asarray(r2.normal(size=cur.shape) * 1e-3, jnp.float32),
            src,
        )

    args_list = [mk(k) for k in range(6)]
    t_f = bench(fwd, args_list) * 1e3
    t_fb = bench(fwdbwd, args_list) * 1e3
    print(f"cost volume (b=2, V=1, D=128, 96x128x48): fwd {t_f:.2f} ms, "
          f"fwd+bwd {t_fb:.2f} ms")


def main():
    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("gather", "all"):
        probe_gather()
    if which in ("raster", "all"):
        probe_raster()
    if which in ("sweep", "all"):
        probe_sweep()


if __name__ == "__main__":
    main()
