"""Full-encoder forward golden test vs the ACTUAL reference.

Composes the reference's entire ``EncoderFreeSplat.forward``
(``/root/reference/src/model/encoder/encoder_freesplat.py:196-429``)
against our ``EncoderFreeSplat`` with a shared deterministic fake
backbone injected on BOTH sides (timm is unavailable offline, and the
backbone's weights are irrelevant to composition parity).  All our
parameters are copied into the reference torch modules; the final
Gaussian multiset plus the intermediate depth maps must match.

Per-module parity lives in test_reference_parity.py /
test_ptf_reference_parity.py; this test exists to catch COMPOSITION
drift — feature routing, skip wiring, per-scale output indexing, PTF
input plumbing — which per-module tests cannot see.
"""
import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_reference_parity import (
    _copy_basic_block,
    _copy_conv,
    _copy_linear,
    _t,
    install_reference_stubs,
)

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

# Real EfficientNetV2-S feature channels (timm feature_info.channels();
# reference encoder_freesplat.py:116-122).  Scale 1 must be 48 so neither
# side inserts a matching projection.
FAKE_CHANNELS = (24, 48, 64, 160, 256)


def _fake_w(i: int) -> np.ndarray:
    rng = np.random.default_rng(100 + i)
    return (rng.standard_normal((FAKE_CHANNELS[i], 3)) * 0.5).astype(
        np.float32
    )


def _make_torch_backbone():
    import torch
    import torch.nn.functional as F

    class FakeBackbone(torch.nn.Module):
        """Deterministic 5-scale pyramid: stride-2^(i+1) average pool then
        a fixed 3->c_i linear map and tanh."""

        def __init__(self):
            super().__init__()
            self.feature_info = types.SimpleNamespace(
                channels=lambda: list(FAKE_CHANNELS)
            )

        def forward(self, x):  # (n, 3, h, w)
            feats = []
            for i in range(5):
                s = 2 ** (i + 1)
                y = F.avg_pool2d(x, s, s)
                w = torch.from_numpy(_fake_w(i)).to(x.dtype)
                feats.append(torch.tanh(torch.einsum("nchw,kc->nkhw", y, w)))
            return feats

    return FakeBackbone()


def _make_flax_backbone():
    from flax import linen as nn

    class FakeBackboneFlax(nn.Module):
        train_bn: bool = False
        compute_dtype: jnp.dtype = jnp.float32

        @nn.compact
        def __call__(self, x):  # (n, h, w, 3)
            feats = []
            n, h, w, _ = x.shape
            for i in range(5):
                s = 2 ** (i + 1)
                y = x.reshape(n, h // s, s, w // s, s, 3).mean(axis=(2, 4))
                feats.append(
                    jnp.tanh(jnp.einsum("nhwc,kc->nhwk", y, _fake_w(i)))
                )
            return feats

    return FakeBackboneFlax


def _copy_cv_encoder(te, p, n_blocks=4):
    for i in range(n_blocks):
        _copy_basic_block(te.convs[f"ds_conv_{i}"], p[f"ds_conv_{i}"])
        _copy_basic_block(te.convs[f"conv_{i}"][0], p[f"conv_{i}a"])
        _copy_basic_block(te.convs[f"conv_{i}"][1], p[f"conv_{i}b"])


def _copy_depth_decoder(td, p, md=4):
    for j in range(1, md + 1):
        for i in range(md - j, -1, -1):
            _copy_basic_block(
                td.convs[f"diag_conv_{i + 1}{j - 1}"],
                p[f"diag_conv_{i + 1}{j - 1}"],
            )
            _copy_basic_block(
                td.convs[f"right_conv_{i}{j - 1}"],
                p[f"right_conv_{i}{j - 1}"],
            )
            if i + j != md:
                _copy_basic_block(
                    td.convs[f"up_conv_{i + 1}{j}"], p[f"up_conv_{i + 1}{j}"]
                )
            _copy_basic_block(
                td.convs[f"in_conv_{i}{j}"][0], p[f"in_conv_{i}{j}"]["block0"]
            )
            _copy_basic_block(
                td.convs[f"in_conv_{i}{j}"].conv_0,
                p[f"in_conv_{i}{j}"]["block1"],
            )
    for i in range(md):
        if i != 0:
            _copy_basic_block(td.convs[f"output_{i}"][0], p[f"output_pre_{i}"])
        _copy_conv(td.convs[f"output_{i}"][1], p[f"output_{i}"])
        _copy_basic_block(td.conv_depth[f"{i}"][0], p[f"conv_depth_{i}a"])
        _copy_conv(td.conv_depth[f"{i}"][1], p[f"conv_depth_{i}b"])
    _copy_basic_block(td.conv_last[0], p["conv_last_a"])
    _copy_conv(td.conv_last[1], p["conv_last_b"])


def _copy_gru(tg, p):
    for name in ("mlp_r", "mlp_z", "mlp_n"):
        seq = getattr(tg, name)
        _copy_linear(seq[0], p[f"{name}_0"])
        _copy_linear(seq[2], p[f"{name}_1"])


@pytest.fixture(scope="module")
def ref_encoder_module():
    # The adapter fixture's stub list covers everything the encoder
    # package pulls in (e3nn, cv2, lightning, ...).
    from tests.test_ptf_reference_parity import ref_adapter  # noqa: F401

    install_reference_stubs()

    class StubModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__") and name.endswith("__"):
                raise AttributeError(name)
            return lambda *a, **k: None

    import torch

    for name in [
        "e3nn", "e3nn.o3", "cv2", "colorspacious", "skimage",
        "skimage.metrics", "wandb", "dacite", "colorama", "lpips",
        "open3d", "pytorch_lightning", "torchmetrics", "mmcv",
        "moviepy", "moviepy.editor", "plyfile",
    ]:
        try:
            __import__(name)
        except ImportError:
            m = StubModule(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.modules["e3nn"].o3 = sys.modules["e3nn.o3"]
    sys.modules["dacite"].Config = object
    sys.modules["pytorch_lightning"].LightningModule = torch.nn.Module
    sys.modules["torchvision.transforms"].ToTensor = object
    sys.modules["timm"].create_model = (
        lambda *a, **k: _make_torch_backbone()
    )
    return importlib.import_module("src.model.encoder.encoder_freesplat")


@pytest.mark.slow
@pytest.mark.parametrize("v", [2, 3])
def test_full_encoder_forward_matches_reference(
    ref_encoder_module, monkeypatch, v
):
    import torch

    import freesplat_tpu.models.encoder as enc_mod
    from freesplat_tpu.models.adapter import GaussianAdapterCfg

    torch.manual_seed(0)
    h, w, b = 32, 64, 1
    D = 8
    sh_degree = 2

    # ---- our encoder with the fake backbone ----
    monkeypatch.setattr(enc_mod, "EfficientNetV2S", _make_flax_backbone())
    cfg = enc_mod.EncoderFreeSplatCfg(
        num_depth_candidates=D,
        num_views=v,
        near=0.5,
        far=15.0,
        adapter=GaussianAdapterCfg(0.5, 15.0, sh_degree),
        train_bn=False,
    )
    ours = enc_mod.EncoderFreeSplat(cfg)

    rng = np.random.default_rng(3)
    images = rng.uniform(0.05, 0.95, (b, v, h, w, 3)).astype(np.float32)
    intr = np.array(
        [[1.1, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1]], np.float32
    )
    intrinsics = np.tile(intr, (b, v, 1, 1))
    extrinsics = np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))
    for i in range(v):
        extrinsics[0, i, 0, 3] = 0.25 * i
        extrinsics[0, i, 1, 3] = -0.1 * i
        c, s = np.cos(0.05 * i), np.sin(0.05 * i)
        extrinsics[0, i, :3, :3] = np.array(
            [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32
        )
    near = np.full((b, v), 0.5, np.float32)
    far = np.full((b, v), 15.0, np.float32)
    context = {
        "image": jnp.asarray(images),
        "intrinsics": jnp.asarray(intrinsics),
        "extrinsics": jnp.asarray(extrinsics),
        "near": jnp.asarray(near),
        "far": jnp.asarray(far),
    }
    variables = ours.init(jax.random.PRNGKey(0), context)
    results = ours.apply(variables, context)
    p = variables["params"]

    # ---- reference encoder with the SAME weights ----
    m = ref_encoder_module
    ref_cfg = m.EncoderFreeSplatCfg(
        name="freesplat",
        d_feature=64,
        num_surfaces=1,
        backbone=None,
        visualizer=None,
        gaussian_adapter=types.SimpleNamespace(
            gaussian_scale_min=0.5,
            gaussian_scale_max=15.0,
            sh_degree=sh_degree,
        ),
        opacity_mapping=m.OpacityMappingCfg(0.0, 0.0, 1),
        num_depth_candidates=D,
        num_views=v,
        image_H=h,
        image_W=w,
        log_planes=True,
    )
    ref = m.EncoderFreeSplat(ref_cfg, depth_range=[0.5, 15.0])
    ref.eval()

    linears = [
        mm for mm in ref.cost_volume.mlp.net
        if isinstance(mm, torch.nn.Linear)
    ]
    for i, lin in enumerate(linears):
        _copy_linear(lin, p["cost_volume"]["mlp"][f"dense_{i}"])
    _copy_cv_encoder(ref.cv_encoder, p["cv_encoder"])
    _copy_depth_decoder(ref.depth_decoder, p["depth_decoder"])
    _copy_conv(ref.high_resolution_skip[0][0], p["hr_skip"])
    _copy_gru(ref.gru, p["fuse"]["gru"])
    _copy_linear(ref.to_gaussians[1], p["fuse"]["to_gaussians"])

    t_context = {
        "image": _t(images).permute(0, 1, 4, 2, 3).contiguous(),
        "intrinsics": _t(intrinsics),
        "extrinsics": _t(extrinsics),
        "near": _t(near),
        "far": _t(far),
    }
    # Capture the reference's PTF inputs: the boundary between the two
    # exact comparison halves (trunk drift would shift these; fuse/head
    # drift shows downstream of them).
    captured = {}
    orig_fuse = ref.fuse_gaussians

    def capturing_fuse(*args, **kwargs):
        captured["args"] = args
        return orig_fuse(*args, **kwargs)

    ref.fuse_gaussians = capturing_fuse
    with torch.no_grad():
        t_results = ref(t_context, global_step=0)

    # ---- intermediate depth parity (positional, catches trunk drift) ----
    ref_depth = (
        t_results["depth_num0_s-1"].reshape(b, v, h, w).numpy()
    )
    np.testing.assert_allclose(
        np.asarray(results["depth_s-1"]), ref_depth, atol=5e-4,
        err_msg="full-res depth",
    )

    # ---- trunk parity: OUR per-view fuse inputs vs the reference's
    # captured fuse inputs (positional — catches skip wiring, feature
    # routing, densities/weights plumbing) ----
    import dataclasses

    trunk = enc_mod.EncoderFreeSplat(
        dataclasses.replace(cfg, trunk_only=True)
    ).apply(variables, context)
    (r_gs, r_coords, r_dens, r_wt, r_depth, r_extr, r_intr, r_shape) = (
        captured["args"]
    )
    hw = h * w
    ref_feat = r_gs[0][0].numpy()  # (v, hw, 64)
    ref_coords = r_coords[0][0, :, :, 0, 0].numpy()  # (v, hw, 3)
    ref_dens = r_dens[0, :, :, :, 0].numpy()  # (v, hw, 1)
    ref_wt = r_wt[0, :, :, :, 0].numpy()  # (v, hw, 1)
    ref_depth_v = r_depth.reshape(v, hw).numpy()
    np.testing.assert_allclose(
        np.asarray(trunk["feat_v"][0]), ref_feat, atol=2e-3,
        err_msg="fuse input: features (hr_skip wiring)",
    )
    np.testing.assert_allclose(
        np.asarray(trunk["coords_v"][0]), ref_coords, atol=2e-3,
        err_msg="fuse input: unprojected means",
    )
    np.testing.assert_allclose(
        np.asarray(trunk["dens_v"][0]), ref_dens, atol=5e-4,
        err_msg="fuse input: densities",
    )
    np.testing.assert_allclose(
        np.asarray(trunk["wt_v"][0]), ref_wt, atol=5e-4,
        err_msg="fuse input: depth weights",
    )
    np.testing.assert_allclose(
        np.asarray(trunk["depth_v"][0]), ref_depth_v, atol=5e-4,
        err_msg="fuse input: depths",
    )

    # ---- fuse + head parity on the REFERENCE's exact fuse inputs
    # (multiset — catches PTF plumbing, to_gaussians head, adapter
    # composition; immune to discrete match-mask boundary flips that
    # ~1e-4 trunk noise causes end-to-end) ----
    fuse_mod = enc_mod._FuseScene(cfg=cfg, image_shape=(h, w))
    g2, _, _ = fuse_mod.apply(
        {"params": p["fuse"]},
        jnp.asarray(ref_feat),
        jnp.asarray(ref_coords),
        jnp.asarray(ref_dens),
        jnp.asarray(ref_wt),
        jnp.asarray(ref_depth_v),
        jnp.asarray(extrinsics[0]),
        jnp.asarray(intrinsics[0]),
    )
    tg = t_results["gaussians"][0]
    mask2 = np.asarray(g2.mask)
    n_fuse = int(mask2.sum())
    n_ref = tg.means.shape[1]
    assert n_fuse == n_ref, (n_fuse, n_ref)
    assert n_ref < v * h * w  # PTF actually merged something

    # ---- end-to-end count sanity: each side's own trunk feeds its own
    # fuse; discrete boundary flips allow small drift, gross drift means
    # wiring divergence ----
    g = results["gaussians"]
    mask = np.asarray(g.mask[0])
    n_ours = int(mask.sum())
    assert abs(n_ours - n_ref) <= 0.025 * n_ref, (n_ours, n_ref)

    def rows(means, cov, harm, op):
        flat = np.concatenate(
            [
                means.reshape(-1, 3),
                cov.reshape(-1, 9),
                harm.reshape(-1, 3 * (sh_degree + 1) ** 2),
                op.reshape(-1, 1),
            ],
            axis=-1,
        )
        return flat[np.lexsort(flat.T[::-1])]

    ours_rows = rows(
        np.asarray(g2.means)[mask2],
        np.asarray(g2.covariances)[mask2],
        np.asarray(g2.harmonics)[mask2],
        np.asarray(g2.opacities)[mask2],
    )
    ref_rows = rows(
        tg.means[0].numpy(),
        tg.covariances[0].numpy(),
        tg.harmonics[0].numpy(),
        tg.opacities[0].numpy(),
    )
    np.testing.assert_allclose(
        ours_rows, ref_rows, atol=2e-3,
        err_msg="fused Gaussian multiset",
    )
