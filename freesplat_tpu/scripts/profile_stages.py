"""Honest (device_get-fenced) stage profiles at ScanNet 2-view shapes.

Usage: python -m freesplat_tpu.scripts.profile_stages [stage ...]
stages: backbone cvenc dec ptf adapter raster train train_bf16
       raster_sub   (binning / instance rows / fwd kernel / bwd kernel
                     / scatter reduction sub-stages)

Run SOLO on the real chip; see docs/PERFORMANCE.md methodology.
"""
import sys
import numpy as np
import jax, jax.numpy as jnp
from freesplat_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from freesplat_tpu.utils.timing import bench

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

def rnd(*shape, dtype=jnp.float32):
    if len(shape) == 1 and isinstance(shape[0], tuple):
        shape = shape[0]
    return jnp.asarray(rng.standard_normal(shape), dtype)

def report(name, fn, args_list, n=6):
    dt = bench(fn, args_list, n=n)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)

b, v, h, w = 1, 2, 384, 512
D = 128
which = set(sys.argv[1:]) or {"backbone", "cv", "cvenc", "dec", "ptf",
                              "adapter", "raster", "train"}

feat_shapes = [(v, 192, 256, 24), (v, 96, 128, 48), (v, 48, 64, 64),
               (v, 24, 32, 160), (v, 12, 16, 256)]

if "backbone" in which:
    from freesplat_tpu.models.backbone import EfficientNetV2S
    x0 = rnd((v, h, w, 3))
    for tbn in (False, True):
        m = EfficientNetV2S(train_bn=tbn)
        vs = m.init(key, x0)
        if tbn:
            f = jax.jit(lambda xx: m.apply(vs, xx, mutable=["batch_stats"]))
        else:
            f = jax.jit(lambda xx: m.apply(vs, xx))
        report(f"backbone fwd bn={tbn}", f, [(rnd((v, h, w, 3)),) for _ in range(3)])
        if tbn:
            def lf(p, xx):
                ys, _ = m.apply({"params": p, "batch_stats": vs["batch_stats"]},
                                xx, mutable=["batch_stats"])
                return sum(y.sum() for y in ys)
            g = jax.jit(jax.grad(lf))
        else:
            def lf(p, xx):
                ys = m.apply({"params": p, "batch_stats": vs.get("batch_stats", {})}
                             if "batch_stats" in vs else {"params": p}, xx)
                return sum(y.sum() for y in ys)
            g = jax.jit(jax.grad(lf))
        report(f"backbone fwd+bwd bn={tbn}", lambda xx, g=g, vs=vs: g(vs["params"], xx),
               [(rnd((v, h, w, 3)),) for _ in range(3)])

if "cvenc" in which:
    from freesplat_tpu.models.networks import CVEncoder
    cve = CVEncoder()
    cv0 = rnd((v, 96, 128, D))
    feats0 = [rnd(*s) for s in feat_shapes]
    vs = cve.init(key, cv0, feats0[1:])
    f = jax.jit(lambda c, fs: cve.apply(vs, c, fs))
    args = [(rnd((v, 96, 128, D)), [rnd(*s) for s in feat_shapes[1:]]) for _ in range(3)]
    report("cv_encoder fwd", f, args)
    g = jax.jit(jax.grad(
        lambda c, fs: sum(o.sum() for o in cve.apply(vs, c, fs)), argnums=0))
    report("cv_encoder fwd+bwd", g, args)

if "dec" in which:
    from freesplat_tpu.models.networks import DepthDecoder
    dd = DepthDecoder(num_output_channels=65, num_samples=D)
    def mk_dec_in():
        return [rnd(*feat_shapes[0]), rnd(v, 96, 128, 64), rnd(v, 48, 64, 128),
                rnd(v, 24, 32, 256), rnd(v, 12, 16, 384)]
    di0 = mk_dec_in()
    vs = dd.init(key, di0)
    f = jax.jit(lambda di: dd.apply(vs, di))
    report("depth_decoder fwd", f, [(mk_dec_in(),) for _ in range(3)])
    g = jax.jit(jax.grad(lambda di: sum(
        o.sum() for o in dd.apply(vs, di).values())))
    report("depth_decoder fwd+bwd", g, [(mk_dec_in(),) for _ in range(3)])

if "ptf" in which:
    from freesplat_tpu.models.ptf import fuse_views
    from freesplat_tpu.models.networks import GRU, positional_encoding
    gru = GRU(hidden_channel=64)
    hw = h * w
    zf = jnp.zeros((1, 64)); ze = positional_encoding(jnp.zeros((1, 2)), 6)
    gvs = gru.init(key, zf, zf, ze, ze)
    gru_apply = lambda i, hh, ie, he: gru.apply(gvs, i, hh, ie, he)
    extr = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1)); extr[1, 0, 3] = 0.2
    intr = np.array([[1.07, 0, .5], [0, 1.42, .5], [0, 0, 1]], np.float32)
    intr_v = jnp.asarray(np.tile(intr, (v, 1, 1)))
    extr_j = jnp.asarray(extr)
    def mk():
        return (rnd(v, hw, 64), rnd(v, hw, 3),
                jnp.asarray(rng.uniform(0, 1, (v, hw, 1)), jnp.float32),
                jnp.asarray(rng.uniform(0, 1, (v, hw, 1)), jnp.float32),
                jnp.asarray(rng.uniform(1, 10, (v, hw)), jnp.float32))
    f = jax.jit(lambda ft, co, de, wt, dp: fuse_views(
        ft, co, de, wt, dp, extr_j, intr_v, (h, w), gru_apply))
    report("ptf fwd", f, [mk() for _ in range(3)])
    def lfn(ft, co, de, wt, dp):
        s = fuse_views(ft, co, de, wt, dp, extr_j, intr_v, (h, w), gru_apply)
        return s.feat.sum() + s.coords.sum() + s.density.sum()
    g = jax.jit(jax.grad(lfn, argnums=(0, 1, 2)))
    report("ptf fwd+bwd", g, [mk() for _ in range(3)])

if "adapter" in which:
    from freesplat_tpu.models.adapter import GaussianAdapterCfg, build_gaussians
    acfg = GaussianAdapterCfg(sh_degree=2)
    nslots = v * h * w
    intr = jnp.asarray(np.array([[1.07, 0, .5], [0, 1.42, .5], [0, 0, 1]], np.float32))
    rot = jnp.tile(jnp.eye(3)[None], (nslots, 1, 1))
    def mk():
        return (rnd(nslots, acfg.d_in),
                jnp.asarray(rng.uniform(1, 10, (nslots,)), jnp.float32))
    f = jax.jit(lambda raw, dpt: build_gaussians(acfg, raw, dpt, rot, intr, (h, w)))
    report("adapter fwd", f, [mk() for _ in range(3)])
    g = jax.jit(jax.grad(lambda raw, dpt: sum(
        x.sum() for x in build_gaussians(acfg, raw, dpt, rot, intr, (h, w)).values()),
        argnums=(0, 1)))
    report("adapter fwd+bwd", g, [mk() for _ in range(3)])

if "raster" in which:
    from freesplat_tpu.ops.gaussians import build_covariance
    from freesplat_tpu.ops.rasterizer import rasterize
    n = 2 * h * w
    extr = jnp.eye(4, dtype=jnp.float32)
    intr = jnp.array([[1.07, 0, 0.5], [0, 1.42, 0.5], [0, 0, 1]], jnp.float32)
    bg = jnp.zeros(3)
    def mk():
        means = jnp.asarray(rng.uniform([-3, -3, 0.8], [3, 3, 10], (n, 3)), jnp.float32)
        q = rng.normal(size=(n, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
        cov = build_covariance(jnp.asarray(rng.uniform(0.005, 0.03, (n, 3)), jnp.float32),
                               jnp.asarray(q, jnp.float32))
        return (means, cov, rnd(n, 3, 9) * 0.3,
                jnp.asarray(rng.uniform(0.3, 1.0, n), jnp.float32))
    f = jax.jit(lambda m, c, hh, o: rasterize(m, c, hh, o, extr, intr, (h, w),
                                              bg, 2, capacity=2 * n))
    report("raster fwd", f, [mk() for _ in range(2)])
    g = jax.jit(jax.value_and_grad(
        lambda m, c, hh, o: jnp.mean(rasterize(m, c, hh, o, extr, intr,
                                               (h, w), bg, 2, capacity=2 * n)[0] ** 2),
        argnums=(0, 1, 2, 3)))
    report("raster fwd+bwd", g, [mk() for _ in range(2)])

if "train" in which or "train_bf16" in which:
    from freesplat_tpu.models.adapter import GaussianAdapterCfg
    from freesplat_tpu.models.decoder import DecoderCfg
    from freesplat_tpu.models.encoder import EncoderFreeSplatCfg
    from freesplat_tpu.training.losses import LossCfg, LossMseCfg
    from freesplat_tpu.training.schedule import OptimizerCfg
    from freesplat_tpu.training.trainer import TrainCfg, init_state, make_train_step
    from freesplat_tpu.scripts.bench_suite import _context
    variants = []
    if "train" in which:
        variants += [(True, "float32"), (False, "float32")]
    if "train_bf16" in which:  # queued round-3 measurement: bf16 encoder
        variants += [(True, "bfloat16")]
    for tbn, cdt in variants:
        cfg = TrainCfg(
            encoder=EncoderFreeSplatCfg(num_depth_candidates=D, num_views=2,
                                        adapter=GaussianAdapterCfg(sh_degree=2),
                                        train_bn=tbn, compute_dtype=cdt),
            decoder=DecoderCfg(sh_degree=2, capacity_factor=2),
            loss=LossCfg(mse=LossMseCfg(1.0), lpips=None),
            optimizer=OptimizerCfg(),
        )
        batch = {"context": _context(2, h, w), "target": _context(1, h, w, seed=1)}
        state = init_state(cfg, key, batch)
        step = make_train_step(cfg)
        def run_step(img, state=state, step=step, batch=batch):
            bb = dict(batch)
            bb["context"] = dict(batch["context"]); bb["context"]["image"] = img
            s, m = step(state, bb)
            return m["loss"]
        f = jax.jit(run_step)
        report(f"train_step bn={tbn} dtype={cdt}", f,
               [(jnp.asarray(rng.uniform(size=(1, 2, h, w, 3)), jnp.float32),)
                for _ in range(3)], n=4)


def raster_substages():

    import numpy as np
    import jax, jax.numpy as jnp
    from freesplat_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from freesplat_tpu.utils.timing import bench
    from freesplat_tpu.ops.gaussians import build_covariance
    from freesplat_tpu.ops.rasterizer import (
        _rasterize_tiles, _rasterize_tiles_fwd_impl, _tile_grid,
        aligned_capacity, bin_gaussians, build_instance_rows, rasterize, CHUNK,
    )
    from freesplat_tpu.ops.rendering import preprocess_gaussians

    h, w = 384, 512
    n = 2 * h * w
    cap = 2 * n
    rng = np.random.default_rng(0)
    extr = jnp.eye(4, dtype=jnp.float32)
    intr = jnp.array([[1.07, 0, 0.5], [0, 1.42, 0.5], [0, 0, 1]], jnp.float32)
    bg = jnp.zeros(3)

    def mk():
        means = jnp.asarray(rng.uniform([-3, -3, 0.8], [3, 3, 10], (n, 3)), jnp.float32)
        q = rng.normal(size=(n, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
        cov = build_covariance(jnp.asarray(rng.uniform(0.005, 0.03, (n, 3)), jnp.float32),
                               jnp.asarray(q, jnp.float32))
        harm = jnp.asarray(rng.normal(size=(n, 3, 9)) * 0.3, jnp.float32)
        opac = jnp.asarray(rng.uniform(0.3, 1.0, n), jnp.float32)
        return means, cov, harm, opac

    def report(name, fn, args_list, nreps=8):
        dt = bench(fn, args_list, n=nreps)
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)

    scenes = [mk() for _ in range(3)]

    # 1. preprocess only
    pre = jax.jit(lambda m, c, hh, o: preprocess_gaussians(
        m, c, hh, o, extr, intr, (h, w), 2))
    report("preprocess fwd", pre, scenes)

    # 1b. preprocess fwd+bwd alone (no gather/scatter): isolates the
    # preprocess VJP from the instance scatter in stage 6.
    def pre_loss(m, c, hh, o):
        s = preprocess_gaussians(m, c, hh, o, extr, intr, (h, w), 2)
        return (s.means2d.sum() + s.conics.sum() + s.opacities.sum()
                + s.colors.sum() + s.depths.sum())
    preg = jax.jit(jax.grad(pre_loss, argnums=(0, 1, 2, 3)))
    report("preprocess fwd+bwd", preg, scenes)

    # 2. binning only (on preprocessed screens)
    screens = [pre(*s) for s in scenes]
    binf = jax.jit(lambda s: bin_gaussians(s, (h, w), cap))
    report("binning", binf, [(s,) for s in screens])

    # 3. instance-row build (gather) only
    bins = [binf(s) for s in screens]
    rowsf = jax.jit(build_instance_rows)
    report("instance rows gather", rowsf, list(zip(screens, bins)))

    # 4. forward kernel only
    th, tw = _tile_grid((h, w))
    instl = [rowsf(s, b) for s, b in zip(screens, bins)]
    kfwd = jax.jit(lambda i, b: _rasterize_tiles_fwd_impl(
        i, b.tile_start, b.tile_count, jnp.array([tw, 0], jnp.int32), th * tw))
    report("fwd kernel", kfwd, list(zip(instl, bins)))

    # 5. fwd+bwd kernel only (through custom_vjp, grads wrt inst)
    def kernel_loss(i, b):
        out = _rasterize_tiles(i, b.tile_start, b.tile_count,
                               jnp.array([tw, 0], jnp.int32), th * tw)
        return jnp.sum(out[..., :4] ** 2)
    kboth = jax.jit(jax.grad(kernel_loss, argnums=0))
    report("fwd+bwd kernel", kboth, list(zip(instl, bins)))

    # 6. instance-grad reduction: scatter-add transpose of the rows gather
    def red_loss(s, b):
        rows = build_instance_rows(s, b)
        return jnp.sum(rows ** 2)
    redg = jax.jit(jax.grad(lambda m, c, hh, o, b: red_loss(
        preprocess_gaussians(m, c, hh, o, extr, intr, (h, w), 2), b),
        argnums=(0, 1, 2, 3)))
    report("preproc+gather fwd+bwd (incl. scatter reduction)", redg,
           [s + (b,) for s, b in zip(scenes, bins)])

    # 7. full rasterize fwd / fwd+bwd
    full = jax.jit(lambda m, c, hh, o: rasterize(
        m, c, hh, o, extr, intr, (h, w), bg, 2, capacity=cap)[0].sum())
    report("full fwd", full, scenes)
    fullg = jax.jit(jax.value_and_grad(lambda m, c, hh, o: jnp.mean(rasterize(
        m, c, hh, o, extr, intr, (h, w), bg, 2, capacity=cap)[0] ** 2),
        argnums=(0, 1, 2, 3)))
    report("full fwd+bwd", fullg, scenes)


if "raster_sub" in which:
    raster_substages()
