"""Weight-conversion tests: fake torch state dicts with the right shapes
must map exactly onto the flax module parameter trees."""
import jax
import jax.numpy as jnp
import numpy as np

from freesplat_tpu.models.backbone import (
    EFFNETV2_S_CONFIG,
    EfficientNetV2S,
    FEATURE_CHANNELS,
    STEM_CH,
)
from freesplat_tpu.training.lpips import LPIPS
from freesplat_tpu.utils.torch_convert import (
    _VGG16_CONV_IDX,
    convert_efficientnetv2_s,
    convert_lpips_vgg,
)


def fake_effnet_state_dict(rng):
    """Build a timm-shaped state dict from scratch (O,I,kh,kw convs)."""
    sd = {}

    def conv(name, o, i, k):
        scale = 1.0 / np.sqrt(i * k * k)  # keep activations bounded
        sd[f"{name}.weight"] = (
            rng.normal(size=(o, i, k, k)) * scale
        ).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2, size=c).astype(np.float32)

    conv("conv_stem", STEM_CH, 3, 3)
    bn("bn1", STEM_CH)
    in_ch = STEM_CH
    for si, (btype, k, _s, e, ch, n, se) in enumerate(EFFNETV2_S_CONFIG):
        for bi in range(n):
            t = f"blocks.{si}.{bi}"
            if btype == "fused":
                if e == 1:
                    conv(f"{t}.conv", ch, in_ch, k)
                    bn(f"{t}.bn1", ch)
                else:
                    conv(f"{t}.conv_exp", in_ch * e, in_ch, k)
                    bn(f"{t}.bn1", in_ch * e)
                    conv(f"{t}.conv_pwl", ch, in_ch * e, 1)
                    bn(f"{t}.bn2", ch)
            else:
                mid = in_ch * e
                conv(f"{t}.conv_pw", mid, in_ch, 1)
                bn(f"{t}.bn1", mid)
                sd[f"{t}.conv_dw.weight"] = (
                    rng.normal(size=(mid, 1, k, k)) / np.sqrt(k * k)
                ).astype(np.float32)
                bn(f"{t}.bn2", mid)
                if se > 0:
                    red = max(1, int(in_ch * se))
                    conv(f"{t}.se.conv_reduce", red, mid, 1)
                    sd[f"{t}.se.conv_reduce.bias"] = np.zeros(red, np.float32)
                    conv(f"{t}.se.conv_expand", mid, red, 1)
                    sd[f"{t}.se.conv_expand.bias"] = np.zeros(mid, np.float32)
                conv(f"{t}.conv_pwl", ch, mid, 1)
                bn(f"{t}.bn3", ch)
            in_ch = ch
    return sd


def test_effnet_conversion_loads_and_runs():
    rng = np.random.default_rng(0)
    sd = fake_effnet_state_dict(rng)
    params, stats = convert_efficientnetv2_s(sd)

    module = EfficientNetV2S(train_bn=False)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    ref_vars = module.init(jax.random.PRNGKey(0), x)

    # Structural match: identical flattened paths and shapes.
    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + "/"))
            else:
                out[prefix + k] = tuple(np.shape(v))
        return out

    assert flat(dict(ref_vars["params"])) == flat(params)

    feats = module.apply(
        {"params": params, "batch_stats": stats}, x
    )
    assert [f.shape[-1] for f in feats] == list(FEATURE_CHANNELS)
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def fake_lpips_state_dict(seed: int = 1) -> dict:
    """Random state dict in the lpips-package layout (net.slice* + lins.*)."""
    rng = np.random.default_rng(seed)
    sd = {}
    chans = [(3, 64, 64), (64, 128, 128), (128, 256, 256, 256),
             (256, 512, 512, 512), (512, 512, 512, 512)]
    for bi, conv_ids in enumerate(_VGG16_CONV_IDX):
        io = chans[bi]
        for ci, idx in enumerate(conv_ids):
            sd[f"net.slice{bi + 1}.{idx}.weight"] = rng.normal(
                size=(io[ci + 1], io[ci], 3, 3)
            ).astype(np.float32)
            sd[f"net.slice{bi + 1}.{idx}.bias"] = np.zeros(
                io[ci + 1], np.float32
            )
    for li, c in enumerate([64, 128, 256, 512, 512]):
        sd[f"lins.{li}.model.1.weight"] = rng.uniform(
            0, 1, size=(1, c, 1, 1)
        ).astype(np.float32)
    return sd


def test_convert_weights_cli_roundtrip(tmp_path):
    """The conversion CLI: torch .pth -> keypath .npz for both weight
    kinds, and the backbone graft produces a working encoder forward."""
    import torch

    from freesplat_tpu.scripts.convert_weights import (
        load_backbone_npz,
        load_tree_npz,
        main as convert,
    )

    # LPIPS leg.
    sd = fake_lpips_state_dict()
    pth = tmp_path / "lpips.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pth)
    convert(["lpips", str(pth), str(tmp_path / "lpips.npz")])
    tree = load_tree_npz(str(tmp_path / "lpips.npz"))
    assert "params" in tree and "vgg" in tree["params"]

    # Backbone leg: fake timm state dict -> npz -> graft -> forward.
    rng = np.random.default_rng(0)
    bsd = fake_effnet_state_dict(rng)
    bpth = tmp_path / "effnet.pth"
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in bsd.items()}, bpth
    )
    convert(["backbone", str(bpth), str(tmp_path / "effnet.npz")])

    from freesplat_tpu.models.adapter import GaussianAdapterCfg
    from freesplat_tpu.models.encoder import EncoderFreeSplat, EncoderFreeSplatCfg
    from tests.test_model import make_context

    cfg = EncoderFreeSplatCfg(
        d_feature=16, num_depth_candidates=8, matching_dim=8,
        adapter=GaussianAdapterCfg(sh_degree=1), train_bn=False,
    )
    enc = EncoderFreeSplat(cfg)
    ctx = make_context(h=32, w=32)
    variables = enc.init(jax.random.PRNGKey(0), ctx)
    grafted = load_backbone_npz(variables, str(tmp_path / "effnet.npz"))
    before = enc.apply(variables, ctx)["depth_s-1"]
    after = enc.apply(grafted, ctx)["depth_s-1"]
    assert np.isfinite(np.asarray(after)).all()
    assert float(np.abs(np.asarray(after) - np.asarray(before)).max()) > 0


def test_lpips_conversion_loads_and_runs():
    rng = np.random.default_rng(1)
    sd = fake_lpips_state_dict()
    variables = convert_lpips_vgg(sd)
    module = LPIPS()
    img = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    ref_vars = module.init(jax.random.PRNGKey(0), img, img)
    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + k + "/"))
            else:
                out[prefix + k] = tuple(np.shape(v))
        return out

    assert flat(dict(ref_vars["params"])) == flat(variables["params"])

    d = module.apply(variables, img, img)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    other = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    d2 = module.apply(variables, img, other)
    assert float(d2[0]) > 0


def test_effnet_strict_conversion_covers_manifest():
    """Strict conversion must consume every non-ignorable key of the
    frozen timm tf_efficientnetv2_s key manifest
    (tests/fixtures/timm_tf_efficientnetv2_s_manifest.json — derived from
    the architecture spec; offline image has no timm checkpoint to diff
    against, so the manifest freezes our best-known layout and any real
    checkpoint that deviates will fail loudly instead of silently
    dropping weights)."""
    import json
    from pathlib import Path

    manifest = json.loads(
        (
            Path(__file__).parent
            / "fixtures"
            / "timm_tf_efficientnetv2_s_manifest.json"
        ).read_text()
    )
    rng = np.random.default_rng(1)
    sd = {
        k: (
            rng.normal(size=shape).astype(np.float32)
            if shape
            else np.zeros((), np.int64)
        )
        for k, shape in manifest.items()
    }
    # The synthetic-roundtrip builder and the manifest must agree on every
    # weight key (the manifest adds only num_batches_tracked counters).
    built = set(fake_effnet_state_dict(np.random.default_rng(0)))
    mkeys = {
        k for k in manifest if not k.endswith(".num_batches_tracked")
    }
    assert built == mkeys

    params, stats = convert_efficientnetv2_s(sd, strict=True)
    assert "conv_stem" in params

    # An unconsumed non-ignorable key must fail loudly.
    sd["blocks.0.0.mystery.weight"] = np.zeros((3, 3), np.float32)
    try:
        convert_efficientnetv2_s(sd, strict=True)
    except ValueError as e:
        assert "mystery" in str(e)
    else:
        raise AssertionError("strict conversion accepted an unmapped key")


def test_lpips_strict_conversion_rejects_unmapped():
    rng = np.random.default_rng(2)
    sd = {}
    chans = [(3, 64, 64), (64, 128, 128), (128, 256, 256, 256),
             (256, 512, 512, 512), (512, 512, 512, 512)]
    for bi, idxs in enumerate(_VGG16_CONV_IDX):
        cs = chans[bi]
        for ci, idx in enumerate(idxs):
            sd[f"net.slice{bi + 1}.{idx}.weight"] = rng.normal(
                size=(cs[ci + 1], cs[ci], 3, 3)
            ).astype(np.float32)
            sd[f"net.slice{bi + 1}.{idx}.bias"] = np.zeros(
                cs[ci + 1], np.float32
            )
    for li, c in enumerate((64, 128, 256, 512, 512)):
        sd[f"lins.{li}.model.1.weight"] = rng.normal(
            size=(1, c, 1, 1)
        ).astype(np.float32)
    convert_lpips_vgg(sd, strict=True)  # all consumed
    sd["net.slice9.0.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    try:
        convert_lpips_vgg(sd, strict=True)
    except ValueError as e:
        assert "slice9" in str(e)
    else:
        raise AssertionError("strict lpips conversion accepted unmapped key")


def test_convert_weights_verify_mode(tmp_path):
    """``verify`` converts AND emits an activation report.  timm / the
    lpips package are absent in this image, so the donor-golden leg
    degrades to the documented structural + our-side forward checks."""
    import json

    import torch

    from freesplat_tpu.scripts.convert_weights import main as convert

    rng = np.random.default_rng(0)
    bsd = fake_effnet_state_dict(rng)
    bpth = tmp_path / "effnet.pth"
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in bsd.items()}, bpth
    )
    dst = tmp_path / "effnet.npz"
    convert(["verify", "backbone", str(bpth), str(dst)])
    report = json.loads((tmp_path / "effnet.npz.verify.json").read_text())
    assert report["kind"] == "backbone"
    assert len(report["scales"]) == 5
    assert all(s["finite"] for s in report["scales"])
    # channels per scale must match the real feature pyramid
    assert [s["shape"][-1] for s in report["scales"]] == [24, 48, 64, 160, 256]

    sd = fake_lpips_state_dict()
    pth = tmp_path / "lpips.pth"
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pth
    )
    ldst = tmp_path / "lpips.npz"
    convert(["verify", "lpips", str(pth), str(ldst)])
    lreport = json.loads((tmp_path / "lpips.npz.verify.json").read_text())
    assert lreport["kind"] == "lpips"
    assert lreport["finite"] and lreport["positive"]
