"""Sharded PTF vs the single-device reference on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from freesplat_tpu.models.networks import GRU, positional_encoding
from freesplat_tpu.models.ptf import fuse_views
from freesplat_tpu.parallel.sharded_ptf import fuse_views_sharded

pytestmark = pytest.mark.slow


def make_inputs(v=4, h=8, w=8, c=16, seed=0):
    rng = np.random.default_rng(seed)
    hw = h * w
    feats = jnp.asarray(rng.standard_normal((v, hw, c)), jnp.float32)
    # Distinct depths (no exact z ties: tie-breaking legitimately differs
    # between the sharded and single-device winners).
    depths = jnp.asarray(rng.uniform(2.0, 8.0, (v, hw)), jnp.float32)
    extr = np.tile(np.eye(4, dtype=np.float32), (v, 1, 1))
    extr[:, 0, 3] = 0.08 * np.arange(v)
    intr = np.tile(
        np.array([[1.1, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], np.float32),
        (v, 1, 1),
    )
    # World coords consistent with each view's depths (unproject).
    ys, xs = np.meshgrid(
        (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
    )
    coords = []
    for vi in range(v):
        fx, fy = intr[vi, 0, 0] * w, intr[vi, 1, 1] * h
        cx, cy = intr[vi, 0, 2] * w, intr[vi, 1, 2] * h
        d = np.asarray(depths[vi]).reshape(h, w)
        x_cam = (xs * w - cx) / fx * d
        y_cam = (ys * h - cy) / fy * d
        pts = np.stack([x_cam, y_cam, d], -1).reshape(-1, 3)
        world = pts @ extr[vi, :3, :3].T + extr[vi, :3, 3]
        coords.append(world)
    coords = jnp.asarray(np.stack(coords), jnp.float32)
    dens = jnp.asarray(rng.uniform(0.2, 0.9, (v, hw, 1)), jnp.float32)
    wts = jnp.asarray(rng.uniform(0.2, 0.9, (v, hw, 1)), jnp.float32)
    return feats, coords, dens, wts, depths, jnp.asarray(extr), jnp.asarray(intr), (h, w)


def make_gru(c):
    gru = GRU(hidden_channel=c)
    zf = jnp.zeros((1, c))
    ze = positional_encoding(jnp.zeros((1, 2)), 6)
    vs = gru.init(jax.random.PRNGKey(0), zf, zf, ze, ze)
    return lambda i, h, ie, he: gru.apply(vs, i, h, ie, he)


def test_sharded_ptf_matches_reference():
    feats, coords, dens, wts, depths, extr, intr, shape = make_inputs(v=4)
    gru_apply = make_gru(feats.shape[-1])
    # use_scan=True: apples to apples — the unrolled python loop
    # constant-folds inv(extrinsics) with slightly different f32 numerics
    # and can flip a borderline pixel's rounding (measured: 1 pixel in
    # 256); both sharded and reference run scan here.
    ref = fuse_views(
        feats, coords, dens, wts, depths, extr, intr, shape, gru_apply,
        use_scan=True,
    )
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("shard",))
    out = fuse_views_sharded(
        feats, coords, dens, wts, depths, extr, intr, shape, gru_apply,
        mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    for name in ["feat", "coords", "density", "weight", "depth"]:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(out, name))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_whole_scene_pipeline_matches_encoder():
    """Explicit pipeline (view-sharded trunk -> sharded PTF -> head) vs
    the plain full encoder, compared at render level (trunk numerics
    shift ~1e-6 under sharding, which PTF winner selection can amplify
    on tie-heavy slots)."""
    from freesplat_tpu.models.adapter import GaussianAdapterCfg
    from freesplat_tpu.models.decoder import DecoderCfg, render_views
    from freesplat_tpu.models.encoder import EncoderFreeSplat, EncoderFreeSplatCfg
    from freesplat_tpu.parallel.distributed import make_mesh
    from freesplat_tpu.parallel.whole_scene import encode_whole_scene
    from freesplat_tpu.training.metrics import compute_psnr
    from tests.test_model import make_context

    cfg = EncoderFreeSplatCfg(
        num_depth_candidates=8, num_views=3, d_feature=16, matching_dim=8,
        adapter=GaussianAdapterCfg(sh_degree=1), train_bn=False,
    )
    encoder = EncoderFreeSplat(cfg)
    ctx = make_context(v=8, h=32, w=32)
    variables = encoder.init(jax.random.PRNGKey(0), ctx)
    ref = encoder.apply(variables, ctx)

    mesh = make_mesh(8)
    out = encode_whole_scene(encoder, variables, ctx, mesh)
    assert out["gaussians"].means.shape == ref["gaussians"].means.shape
    np.testing.assert_allclose(
        np.asarray(ref["depth_s-1"]), np.asarray(out["depth_s-1"]), atol=1e-4
    )

    dec = DecoderCfg(sh_degree=1, use_reference_rasterizer=True)

    def render(res):
        return np.asarray(render_views(
            dec, jax.tree_util.tree_map(jnp.asarray, res["gaussians"]),
            ctx["extrinsics"][:, :2], ctx["intrinsics"][:, :2],
            ctx["near"][:, :2], ctx["far"][:, :2], (32, 32),
        ).color)

    psnr = float(np.mean(np.asarray(compute_psnr(render(ref), render(out)))))
    assert psnr > 35.0, f"pipeline-vs-encoder render PSNR {psnr:.1f}"

    # Sharded rendering of the same set (Gaussian shards x tile slabs;
    # tile columns must divide the mesh -> 16 columns / 8 devices).
    from freesplat_tpu.models.decoder import render_view
    from freesplat_tpu.parallel.whole_scene import render_whole_scene

    dec_p = DecoderCfg(sh_degree=1)
    shape = (32, 256)
    color_sh, depth_sh, alpha_sh = render_whole_scene(
        dec_p, out["gaussians"], ctx["extrinsics"][0, :2],
        ctx["intrinsics"][0, :2], ctx["near"][0, :2], ctx["far"][0, :2],
        shape, mesh,
    )
    g0 = jax.tree_util.tree_map(lambda x: x[0], out["gaussians"])
    c_ref, d_ref, a_ref, _ = render_view(
        dec_p, g0, ctx["extrinsics"][0, 0], ctx["intrinsics"][0, 0],
        ctx["near"][0, 0], ctx["far"][0, 0], shape,
    )
    np.testing.assert_allclose(
        np.asarray(color_sh[0]), np.asarray(c_ref), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(alpha_sh[0]), np.asarray(a_ref), atol=5e-5
    )


def test_sharded_ptf_two_views_per_device():
    """v = 2 * devices exercises non-owner iterations and block offsets."""
    feats, coords, dens, wts, depths, extr, intr, shape = make_inputs(
        v=8, seed=3
    )
    gru_apply = make_gru(feats.shape[-1])
    ref = fuse_views(
        feats, coords, dens, wts, depths, extr, intr, shape, gru_apply,
        use_scan=True,
    )
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("shard",))
    out = fuse_views_sharded(
        feats, coords, dens, wts, depths, extr, intr, shape, gru_apply,
        mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    merged = int(np.asarray(ref.valid).sum())
    assert merged < feats.shape[0] * feats.shape[1]  # something fused
    for name in ["feat", "coords", "density", "weight", "depth"]:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(out, name))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
