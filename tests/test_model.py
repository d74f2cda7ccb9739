"""Module tests: networks, cost volume, PTF, encoder+decoder end to end.

Tiny shapes + fixed RNG on CPU (SURVEY §4c test strategy).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesplat_tpu.models.cost_volume import CostVolume, inverse_depth_planes
from freesplat_tpu.models.decoder import DecoderCfg, render_views
from freesplat_tpu.models.encoder import (
    EncoderFreeSplat,
    EncoderFreeSplatCfg,
    select_source_views,
)
from freesplat_tpu.models.networks import (
    CVEncoder,
    DepthDecoder,
    GRU,
    positional_encoding,
)
from freesplat_tpu.models.ptf import PTFState, fuse_views
from freesplat_tpu.models.adapter import GaussianAdapterCfg

pytestmark = pytest.mark.slow

H, W = 64, 64


def make_context(b=1, v=2, h=H, w=W, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(size=(b, v, h, w, 3)).astype(np.float32)
    intr = np.zeros((b, v, 3, 3), np.float32)
    intr[..., 0, 0] = 1.1
    intr[..., 1, 1] = 1.1
    intr[..., 0, 2] = 0.5
    intr[..., 1, 2] = 0.5
    intr[..., 2, 2] = 1.0
    extr = np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))
    for vi in range(v):
        extr[:, vi, 0, 3] = 0.15 * vi  # small x translation
    return {
        "image": jnp.asarray(images),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
        "near": jnp.full((b, v), 0.5),
        "far": jnp.full((b, v), 15.0),
    }


def test_inverse_depth_planes():
    d = np.asarray(inverse_depth_planes(8, 1.0, 8.0))
    assert d[0] == pytest.approx(1.0)
    assert d[-1] == pytest.approx(8.0)
    assert np.all(np.diff(d) > 0)
    # Linear in inverse depth.
    inv = 1.0 / d
    np.testing.assert_allclose(np.diff(inv), np.diff(inv)[0], rtol=1e-5)


def test_cost_volume_peaks_at_true_depth():
    """A textured fronto-parallel plane at known depth must produce the
    strongest cosine correlation at the sweep plane nearest that depth."""
    h = w = 16
    c = 8
    depth_true = 3.0
    baseline = 0.4
    fx = fy = float(w)
    intr = jnp.array(
        [[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], dtype=jnp.float32
    )
    k44 = jnp.eye(4).at[:3, :3].set(intr)
    # src_T_cur maps cur-camera points into the src camera (shifted +x).
    src_T_cur = jnp.eye(4).at[0, 3].set(-baseline)

    def texture(x, y):
        # Smooth multi-frequency texture of world-plane coordinates.
        ks = jnp.arange(1, c + 1, dtype=jnp.float32)
        return jnp.sin(3.0 * ks * x[..., None] + 5.0 * y[..., None] * ks)

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    # World point each cur pixel sees on the z=depth_true plane.
    wx_cur = (xs - w / 2) / fx * depth_true
    wy_cur = (ys - h / 2) / fy * depth_true
    cur_feat = texture(wx_cur, wy_cur)[None]  # (1, h, w, c)
    # Src camera center sits at +baseline: its pixel rays hit the plane at
    # world x shifted by the baseline.
    wx_src = (xs - w / 2) / fx * depth_true + baseline
    src_feat = texture(wx_src, wy_cur)[None]

    for sim in ("avg_mlp", "cosine"):
        module = CostVolume(num_depth_bins=16, plane_chunk=8, similarity=sim)
        args = (
            cur_feat, src_feat[None], src_T_cur[None, None],
            k44[None, None], jnp.linalg.inv(k44)[None], 1.0, 10.0,
        )
        params = module.init(jax.random.PRNGKey(0), *args)
        vol = np.asarray(module.apply(params, *args))  # (1, h, w, D)
        assert vol.shape == (1, h, w, 16)
        assert np.all(np.isfinite(vol))
        assert np.abs(vol).max() > 0.1  # the sweep actually sampled
        if sim == "cosine":
            # Central pixels: the best plane is the one nearest depth_true.
            depths = np.asarray(inverse_depth_planes(16, 1.0, 10.0))
            expect = np.argmin(np.abs(depths - depth_true))
            centre = vol[0, 4:-4, 4:-4]
            best = np.argmax(centre, axis=-1)
            hits = np.mean(np.abs(best - expect) <= 1)
            assert hits > 0.8, (expect, np.bincount(best.ravel()))
            assert centre.max() > 0.95  # near-perfect similarity at match


def test_depth_decoder_shapes_and_range():
    rng = jax.random.PRNGKey(0)
    n = 2
    chans = [24, 64, 128, 256, 384]
    feats = [
        jnp.ones((n, H // (2 ** (i + 1)), W // (2 ** (i + 1)), c))
        for i, c in enumerate(chans)
    ]
    module = DepthDecoder(num_output_channels=65, num_samples=16)
    params = module.init(rng, feats)
    out = module.apply(params, feats)
    assert out["depth_s-1"].shape == (n, H, W, 1)
    assert out["output_s-1"].shape == (n, H, W, 65)
    assert out["depth_weights"].shape == (n, H, W, 1)
    for s in range(4):
        hs = H // (2 ** (s + 1))
        assert out[f"depth_s{s}"].shape == (n, hs, hs, 1)
        d = np.asarray(out[f"depth_s{s}"])
        assert np.all(d >= 0.5 - 1e-4) and np.all(d <= 15.0 + 1e-4)


def test_cv_encoder_shapes():
    rng = jax.random.PRNGKey(0)
    n = 2
    cv = jnp.ones((n, 16, 16, 32))
    img_feats = [
        jnp.ones((n, 16 // (2**i), 16 // (2**i), c))
        for i, c in enumerate([48, 64, 160, 256])
    ]
    module = CVEncoder(num_ch_outs=(64, 128, 256, 384))
    params = module.init(rng, cv, img_feats)
    outs = module.apply(params, cv, img_feats)
    assert [o.shape for o in outs] == [
        (n, 16, 16, 64), (n, 8, 8, 128), (n, 4, 4, 256), (n, 2, 2, 384)
    ]


def test_gru_gate_behavior():
    rng = jax.random.PRNGKey(0)
    module = GRU(hidden_channel=8)
    inp = jnp.ones((4, 8))
    hid = jnp.zeros((4, 8))
    emb = jnp.ones((4, 2 * 2 * 6))
    params = module.init(rng, inp, hid, emb, emb)
    out = module.apply(params, inp, hid, emb, emb)
    assert out.shape == (4, 8)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # convex mix of hid & tanh


def test_positional_encoding():
    x = jnp.array([[0.5, 1.0]])
    pe = positional_encoding(x, 6)
    assert pe.shape == (1, 24)
    np.testing.assert_allclose(float(pe[0, 0]), np.sin(0.5), atol=1e-6)


def test_select_source_views():
    extr = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    extr[1, 0, 3] = 0.1
    extr[2, 0, 3] = 1.0
    extr[3, 0, 3] = 5.0
    idx = np.asarray(select_source_views(jnp.asarray(extr), 2))
    assert idx.shape == (4, 2)
    assert set(idx[0]) == {1, 2}  # nearest to view 0: views 1 then 2
    assert 0 not in idx[0] and 3 not in idx[0]


def test_ptf_fusion_merges_identical_views():
    """Two identical views: every pixel should merge (≈ HW valid slots)."""
    rng = np.random.default_rng(2)
    v, h, w, c = 2, 8, 8, 16
    hw = h * w
    feats = jnp.tile(
        jnp.asarray(rng.normal(size=(1, hw, c)), dtype=jnp.float32), (v, 1, 1)
    )
    depths = jnp.full((v, hw), 2.0)
    intr = jnp.tile(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32),
        (v, 1, 1),
    )
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (v, 1, 1))
    from freesplat_tpu.models.adapter import unproject_depth

    coords = unproject_depth(
        depths.reshape(v, h, w), intr, extr, (h, w)
    ).reshape(v, hw, 3)
    # Nudge x so reprojection lands at pixel + 0.3 (not an exact half-pixel,
    # where round-half-to-even would scatter projections — same behavior as
    # the reference's torch.round).
    coords = coords - jnp.array([0.2 * 2.0 / w, 0.2 * 2.0 / h, 0.0])
    dens = jnp.full((v, hw, 1), 0.5)
    wts = jnp.full((v, hw, 1), 0.8)

    def gru_apply(inp, hid, ie, he):
        return 0.5 * (inp + hid)

    state = fuse_views(
        feats, coords, dens, wts, depths, extr, intr, (h, w), gru_apply
    )
    n_valid = int(state.valid.sum())
    assert n_valid == hw  # all of view 1 merged into view 0
    # Densities of merged slots summed.
    np.testing.assert_allclose(
        np.asarray(state.density[:hw, 0]), 1.0, atol=1e-6
    )
    # Merged features are the GRU mix of the two (identical) feats.
    np.testing.assert_allclose(
        np.asarray(state.feat[:hw]), np.asarray(feats[0]), atol=1e-5
    )


def test_ptf_fusion_keeps_disjoint_views():
    """Two cameras looking at opposite directions: nothing merges."""
    rng = np.random.default_rng(3)
    v, h, w, c = 2, 8, 8, 8
    hw = h * w
    feats = jnp.asarray(rng.normal(size=(v, hw, c)), dtype=jnp.float32)
    depths = jnp.full((v, hw), 2.0)
    intr = jnp.tile(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32),
        (v, 1, 1),
    )
    flip = np.eye(4, dtype=np.float32)
    flip[0, 0] = flip[2, 2] = -1.0  # 180deg yaw
    extr = jnp.stack([jnp.eye(4), jnp.asarray(flip)])
    from freesplat_tpu.models.adapter import unproject_depth

    coords = unproject_depth(
        depths.reshape(v, h, w), intr, extr, (h, w)
    ).reshape(v, hw, 3)
    dens = jnp.full((v, hw, 1), 0.5)
    wts = jnp.full((v, hw, 1), 0.8)

    state = fuse_views(
        feats, coords, dens, wts, depths, extr, intr, (h, w),
        lambda i, h_, a, b: i,
    )
    assert int(state.valid.sum()) == 2 * hw  # nothing merged


def test_encoder_decoder_end_to_end():
    """Full forward: images -> gaussians -> rendered target, grads flow."""
    cfg = EncoderFreeSplatCfg(
        num_depth_candidates=16,
        adapter=GaussianAdapterCfg(sh_degree=1),
    )
    context = make_context()
    module = EncoderFreeSplat(cfg)
    rng = jax.random.PRNGKey(0)
    variables = module.init(rng, context)
    results, mutated = module.apply(variables, context, mutable=["batch_stats"])
    g = results["gaussians"]
    G = 2 * H * W
    assert g.means.shape == (1, G, 3)
    assert g.covariances.shape == (1, G, 3, 3)
    assert g.harmonics.shape == (1, G, 3, 4)
    assert g.opacities.shape == (1, G)
    assert int(results["num_gaussians"][0]) <= G
    assert np.all(np.isfinite(np.asarray(g.means)))

    dec_cfg = DecoderCfg(sh_degree=1, use_reference_rasterizer=False)
    out = render_views(
        dec_cfg, g,
        context["extrinsics"][:, :1], context["intrinsics"][:, :1],
        context["near"][:, :1], context["far"][:, :1], (H, W),
    )
    assert out.color.shape == (1, 1, H, W, 3)
    assert np.all(np.isfinite(np.asarray(out.color)))

    def loss_fn(params):
        vs = {**variables, "params": params}
        res, _ = module.apply(vs, context, mutable=["batch_stats"])
        o = render_views(
            dec_cfg, res["gaussians"],
            context["extrinsics"][:, :1], context["intrinsics"][:, :1],
            context["near"][:, :1], context["far"][:, :1], (H, W),
        )
        return jnp.mean((o.color - context["image"][:, :1]) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_encoder_batch_independence():
    """At fixed batch size, scene 0's outputs must be bit-exact when scene
    1's data changes: the vmapped cost-volume/PTF batch path (no python
    loop over b) must not couple batch elements.  Note b=2-vs-b=1 outputs
    may legitimately differ ~1e-6 in depth (XLA picks batch-size-dependent
    conv algorithms), which PTF's discrete z-buffer winner selection can
    amplify — so the invariance test below, not batch slicing, is the
    correct no-coupling check."""
    cfg = EncoderFreeSplatCfg(
        d_feature=16, num_depth_candidates=8, matching_dim=8,
        adapter=GaussianAdapterCfg(sh_degree=1), train_bn=False,
    )
    module = EncoderFreeSplat(cfg)
    ctx = make_context(b=2)
    variables = module.init(jax.random.PRNGKey(0), ctx)
    res_a = module.apply(variables, ctx)

    img = np.asarray(ctx["image"]).copy()
    img[1] = np.random.default_rng(99).uniform(size=img[1].shape)
    ctx_b = {**ctx, "image": jnp.asarray(img)}
    res_b = module.apply(variables, ctx_b)

    for key in ["depth_s-1", "densities", "depth_weights"]:
        a = np.asarray(res_a[key]).reshape(2, -1)
        b = np.asarray(res_b[key]).reshape(2, -1)
        np.testing.assert_array_equal(a[0], b[0], err_msg=key)
    for field in ["means", "covariances", "harmonics", "opacities"]:
        a = np.asarray(getattr(res_a["gaussians"], field))
        b = np.asarray(getattr(res_b["gaussians"], field))
        np.testing.assert_array_equal(a[0], b[0], err_msg=field)
        assert np.abs(a[1] - b[1]).max() > 0  # scene 1 actually changed


def test_encoder_local_source_selection():
    """v > num_views exercises the pose-distance top-k source path."""
    cfg = EncoderFreeSplatCfg(
        num_depth_candidates=8,
        num_views=3,
        adapter=GaussianAdapterCfg(sh_degree=1),
        train_bn=False,
    )
    context = make_context(v=4)
    module = EncoderFreeSplat(cfg)
    variables = module.init(jax.random.PRNGKey(0), context)
    results = module.apply(variables, context)
    g = results["gaussians"]
    G = 4 * H * W
    assert g.means.shape == (1, G, 3)
    assert int(results["num_gaussians"][0]) <= G
    assert np.isfinite(np.asarray(g.opacities)).all()


def test_encoder_bf16_compute():
    """bf16 compute dtype: outputs stay f32 and finite, params f32."""
    cfg = EncoderFreeSplatCfg(
        num_depth_candidates=8,
        adapter=GaussianAdapterCfg(sh_degree=1),
        train_bn=False,
        compute_dtype="bfloat16",
    )
    context = make_context()
    module = EncoderFreeSplat(cfg)
    variables = module.init(jax.random.PRNGKey(0), context)
    # Params stay f32.
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    results = module.apply(variables, context)
    g = results["gaussians"]
    assert g.means.dtype == jnp.float32
    assert np.isfinite(np.asarray(g.means)).all()
    assert np.isfinite(np.asarray(g.covariances)).all()
    d = results["depth_s-1"]
    assert d.dtype == jnp.float32
    assert float(d.min()) >= 0.4 and float(d.max()) <= 16.0


def test_packed_bilinear_matches_plain():
    from freesplat_tpu.ops.grid_sample import (
        bilinear_sample,
        bilinear_sample_packed,
        pack_quad,
    )

    rng = np.random.default_rng(11)
    feat = jnp.asarray(rng.normal(size=(3, 17, 23, 6)), dtype=jnp.float32)
    coords = jnp.asarray(
        rng.uniform(-3, 26, size=(3, 800, 2)), dtype=jnp.float32
    )
    a = bilinear_sample(feat, coords)
    b = bilinear_sample_packed(pack_quad(feat), coords)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # Gradients agree too.
    ga = jax.grad(lambda f: jnp.sum(bilinear_sample(f, coords) ** 2))(feat)
    gb = jax.grad(
        lambda f: jnp.sum(bilinear_sample_packed(pack_quad(f), coords) ** 2)
    )(feat)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)


def test_encoder_fvt_8views_merges():
    """FVT path: 8 context views, nearest-2 cost-volume sources, PTF
    compacts the global set substantially (gs_ratio << 1)."""
    cfg = EncoderFreeSplatCfg(
        num_depth_candidates=8, num_views=3,
        adapter=GaussianAdapterCfg(sh_degree=1), train_bn=False,
    )
    context = make_context(v=8, h=32, w=32)
    module = EncoderFreeSplat(cfg)
    variables = module.init(jax.random.PRNGKey(0), context)
    results = module.apply(variables, context)
    ratio = float(results["gs_ratio"][0])
    assert results["gaussians"].means.shape == (1, 8 * 32 * 32, 3)
    assert 0.1 < ratio < 0.95  # meaningful cross-view merging happened


def test_encoder_fvt_whole_scene_30views():
    """Whole-scene FVT at the reference's 30-view eval scale
    (fvt.yaml: 8-view training, 30-view whole-scene test): pose-distance
    top-k source selection must activate (v=30 > num_views=5), scan-PTF
    must compact the overlapping trajectory (gs_ratio drops well below 1
    and below the disjoint-view case), and chunked rendering of many
    targets must stay finite."""
    v = 30
    cfg = EncoderFreeSplatCfg(
        num_depth_candidates=8, num_views=5, d_feature=16, matching_dim=8,
        adapter=GaussianAdapterCfg(sh_degree=1), train_bn=False,
    )
    # Loop trajectory: the end revisits the start, so nearest-k source
    # selection must pick spatial neighbours, not index neighbours.
    rng = np.random.default_rng(0)
    extr = np.tile(np.eye(4, dtype=np.float32), (1, v, 1, 1))
    theta = np.linspace(0, 2 * np.pi, v, endpoint=False)
    extr[0, :, 0, 3] = 0.4 * np.cos(theta)
    extr[0, :, 2, 3] = 0.4 * np.sin(theta)
    sel = select_source_views(jnp.asarray(extr[0]), num_src=4)
    # View 0's nearest pose neighbours on the loop include view v-1.
    assert v - 1 in np.asarray(sel)[0]
    assert 0 not in np.asarray(sel)[0]

    context = make_context(v=v, h=32, w=32)
    context["extrinsics"] = jnp.asarray(extr)
    module = EncoderFreeSplat(cfg)
    variables = module.init(jax.random.PRNGKey(0), context)
    results = module.apply(variables, context)
    ratio = float(results["gs_ratio"][0])
    assert results["gaussians"].means.shape == (1, v * 32 * 32, 3)
    assert 0.05 < ratio < 0.9  # heavy cross-view merging on the loop

    # Chunked many-target rendering (harness render_chunk_size pathway).
    dec_cfg = DecoderCfg(sh_degree=1, use_reference_rasterizer=False)
    tgt = slice(0, 8)
    out = render_views(
        dec_cfg, results["gaussians"],
        context["extrinsics"][:, tgt], context["intrinsics"][:, tgt],
        context["near"][:, tgt], context["far"][:, tgt], (32, 32),
    )
    assert out.color.shape == (1, 8, 32, 32, 3)
    assert np.isfinite(np.asarray(out.color)).all()


def test_cost_volume_cosine_variant():
    """The base CostVolumeManager mode: cosine similarity, no MLP, values
    bounded to [-1, 1]."""
    rng = np.random.default_rng(4)
    h = w = 8
    c = 6
    intr = jnp.array(
        [[w, 0, w / 2], [0, h, h / 2], [0, 0, 1]], dtype=jnp.float32
    )
    k44 = jnp.eye(4).at[:3, :3].set(intr)
    t = jnp.eye(4).at[0, 3].set(-0.1)
    feat = jnp.asarray(rng.normal(size=(1, h, w, c)), dtype=jnp.float32)

    module = CostVolume(num_depth_bins=8, plane_chunk=4, similarity="cosine")
    args = (
        feat, feat[None], t[None, None], k44[None, None],
        jnp.linalg.inv(k44)[None], 0.5, 15.0,
    )
    params = module.init(jax.random.PRNGKey(0), *args)
    # No MLP parameters in the cosine variant.
    assert jax.tree_util.tree_leaves(params) == []
    vol = module.apply(params, *args)
    assert vol.shape == (1, h, w, 8)
    v = np.asarray(vol)
    assert np.all(np.isfinite(v)) and np.all(v >= -1.001) and np.all(v <= 1.001)
    assert np.abs(v).max() > 0.1  # in-bounds sweep actually sampled


def test_bilinear_resize_matches_torch():
    """upsample2x (fixed 2-phase stencil) and the matmul-based general
    resize must match torch.nn.functional.interpolate in both
    align_corners modes (reference uses torch upsampling throughout)."""
    import torch

    from freesplat_tpu.models.layers import (
        _interpolate_bilinear,
        upsample2x,
    )

    rng = np.random.default_rng(0)

    def torch_resize(x, out_hw, ac):
        return torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="bilinear", align_corners=ac,
        ).permute(0, 2, 3, 1).numpy()

    for shape, out_hw, ac in [
        ((2, 24, 32, 65), (48, 64), False),
        ((1, 7, 9, 3), (19, 5), False),
        ((2, 24, 32, 12), (48, 64), True),
        ((1, 5, 5, 2), (13, 7), True),
    ]:
        x = rng.standard_normal(shape).astype(np.float32)
        mine = np.asarray(
            _interpolate_bilinear(jnp.asarray(x), *out_hw, align_corners=ac)
        )
        np.testing.assert_allclose(
            mine, torch_resize(x, out_hw, ac), atol=1e-4,
            err_msg=f"{shape}->{out_hw} ac={ac}",
        )
    x = rng.standard_normal((2, 24, 32, 65)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(upsample2x(jnp.asarray(x))),
        torch_resize(x, (48, 64), False),
        atol=1e-5,
    )


def test_map_pdf_to_opacity():
    from freesplat_tpu.models.encoder import OpacityMappingCfg, map_pdf_to_opacity

    pdf = jnp.linspace(0.0, 1.0, 11)
    # Default cfg -> exponent 1 -> identity.
    out = map_pdf_to_opacity(pdf, global_step=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pdf), atol=1e-6)
    # Warm-up schedule: exponent interpolates 2^initial -> 2^final.
    cfg = OpacityMappingCfg(initial=0.0, final=2.0, warm_up=100)
    mid = map_pdf_to_opacity(pdf, global_step=50, cfg=cfg)  # exponent 2
    expect = 0.5 * (1 - (1 - pdf) ** 2 + pdf**0.5)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(expect), atol=1e-6)
    end = map_pdf_to_opacity(pdf, global_step=1000, cfg=cfg)  # exponent 4
    assert float(end[5]) > float(mid[5])  # sharper mapping pushes mid-pdf up


def test_ptf_scan_matches_loop():
    """lax.scan PTF (many-view path) is bit-identical to the unrolled loop."""
    rng = np.random.default_rng(9)
    v, h, w, c = 5, 6, 6, 8
    hw = h * w
    feats = jnp.asarray(rng.normal(size=(v, hw, c)), dtype=jnp.float32)
    depths = jnp.asarray(rng.uniform(1.5, 3.0, (v, hw)), dtype=jnp.float32)
    intr = jnp.tile(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32),
        (v, 1, 1),
    )
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (v, 1, 1))
    extr = extr.at[:, 0, 3].set(jnp.linspace(0.0, 0.4, v))
    from freesplat_tpu.models.adapter import unproject_depth

    coords = unproject_depth(
        depths.reshape(v, h, w), intr, extr, (h, w)
    ).reshape(v, hw, 3)
    # Nudge off exact half-pixel reprojections: XLA may fuse the u = x/z*f+c
    # chain differently under lax.scan, and a 1-ulp difference at .5 flips
    # banker's rounding (same quirk as the torch reference's round()).
    coords = coords - jnp.array([0.23 * 2.0 / w, 0.17 * 2.0 / h, 0.0])
    dens = jnp.asarray(rng.uniform(0.1, 0.9, (v, hw, 1)), dtype=jnp.float32)
    wts = jnp.asarray(rng.uniform(0.1, 0.9, (v, hw, 1)), dtype=jnp.float32)

    def gru_apply(inp, hid, ie, he):
        return 0.3 * inp + 0.7 * hid + 0.01 * ie.sum(-1, keepdims=True)

    loop = fuse_views(
        feats, coords, dens, wts, depths, extr, intr, (h, w), gru_apply,
        use_scan=False,
    )
    scan = fuse_views(
        feats, coords, dens, wts, depths, extr, intr, (h, w), gru_apply,
        use_scan=True,
    )
    for name in PTFState._fields:
        a, b_ = np.asarray(getattr(loop, name)), np.asarray(getattr(scan, name))
        if a.dtype == bool:
            np.testing.assert_array_equal(a, b_, err_msg=name)
        else:
            # Merge decisions must agree exactly; values may differ by ulps
            # (XLA fuses the arithmetic differently inside scan).
            np.testing.assert_allclose(a, b_, atol=1e-5, rtol=1e-5, err_msg=name)
