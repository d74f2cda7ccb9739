"""Convert reference pretrained torch checkpoints to loadable .npz trees.

The reference initializes its backbone from timm
(``tf_efficientnetv2_s_in21ft1k``, encoder_freesplat.py:116-122) and
its perceptual loss from the ``lpips`` package's VGG16
(loss_lpips.py:33).  This offline image bundles neither; when the torch
checkpoints are available, convert them once:

  python -m freesplat_tpu.scripts.convert_weights lpips lpips_vgg.pth out.npz
      -> point loss.lpips.weights_path at out.npz

  python -m freesplat_tpu.scripts.convert_weights backbone effnetv2s.pth out.npz
      -> graft into a checkpoint with load_backbone_npz (see below), or
         restore non-strict via training/checkpoint.

  python -m freesplat_tpu.scripts.convert_weights verify {backbone|lpips} src.pth out.npz
      -> convert AND write out.npz.verify.json: per-scale forward-
         activation statistics through our flax modules, plus the max
         activation diff vs the original torch model when timm / the
         lpips package are importable (exits nonzero past 1e-3).

Trees are stored as flat "a/b/c" keypath arrays (same format as
training/lpips.save_lpips_params).  Runbook: README "Pretrained
weights".
"""
from __future__ import annotations

import sys

import numpy as np


def _save_tree(tree: dict, path: str) -> None:
    from ..training.lpips import save_lpips_params

    save_lpips_params(tree, path)  # generic keypath-npz writer


def load_tree_npz(path: str) -> dict:
    from ..training.lpips import load_lpips_params

    return load_lpips_params(path)  # generic keypath-npz reader


def load_backbone_npz(variables: dict, path: str) -> dict:
    """Graft converted backbone weights into an encoder variables tree
    (params/backbone + batch_stats/backbone)."""
    tree = load_tree_npz(path)
    out = {k: dict(v) for k, v in variables.items()}
    out["params"] = dict(out["params"])
    out["params"]["backbone"] = tree["params"]
    if "batch_stats" in tree:
        out.setdefault("batch_stats", {})
        out["batch_stats"] = dict(out["batch_stats"])
        out["batch_stats"]["backbone"] = tree["batch_stats"]
    return out


def _probe_images(n: int = 2, hw: int = 64, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, (n, hw, hw, 3)).astype(np.float32)


def verify_backbone(npz_path: str, src_pth: str | None = None) -> dict:
    """Activation-level verification of a converted backbone.

    Always: load the npz, run OUR EfficientNetV2-S on a fixed probe and
    report per-scale statistics + finiteness.  When ``timm`` is importable
    (the donor environment that produced the .pth), additionally run the
    torch model on the same probe and report the per-scale max activation
    difference — the real golden.  Reference: encoder_freesplat.py:116-122.
    """
    import jax

    from ..models.backbone import EfficientNetV2S

    tree = load_tree_npz(npz_path)
    variables = {"params": tree["params"]}
    if "batch_stats" in tree:
        variables["batch_stats"] = tree["batch_stats"]
    probe = _probe_images()
    feats = EfficientNetV2S(train_bn=False).apply(
        variables, np.asarray(probe)
    )
    report: dict = {"kind": "backbone", "scales": []}
    for i, f in enumerate(feats):
        f = np.asarray(f)
        report["scales"].append({
            "shape": list(f.shape),
            "finite": bool(np.isfinite(f).all()),
            "mean": float(f.mean()),
            "std": float(f.std()),
        })
    try:
        import timm  # noqa: F401
        import torch

        tm = timm.create_model(
            "tf_efficientnetv2_s", features_only=True, pretrained=False
        )
        sd = torch.load(src_pth, map_location="cpu", weights_only=True)
        tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False
        )
        tm.eval()
        with torch.no_grad():
            tfeats = tm(
                torch.from_numpy(probe).permute(0, 3, 1, 2).contiguous()
            )
        diffs = []
        for f, tf in zip(feats, tfeats):
            tf = tf.permute(0, 2, 3, 1).numpy()
            diffs.append(float(np.abs(np.asarray(f) - tf).max()))
        report["timm_activation_max_abs_diff"] = diffs
        report["timm_ok"] = all(d < 1e-3 for d in diffs)
    except ImportError:
        report["timm_activation_max_abs_diff"] = None
        report["note"] = (
            "timm not importable in this environment - structural + "
            "our-side forward checks only (the strict key manifest was "
            "already enforced during conversion)"
        )
    return report


def verify_lpips(npz_path: str, src_pth: str | None = None) -> dict:
    """Same contract for the LPIPS-VGG perceptual loss
    (reference loss_lpips.py:27-33): our-side distances on fixed probe
    pairs, plus a diff vs the ``lpips`` package when importable."""
    from ..training.lpips import LPIPS, load_lpips_params

    params = load_lpips_params(npz_path)
    a = _probe_images(seed=5)
    b = _probe_images(seed=6)
    ours = np.asarray(LPIPS().apply(params, a, b))
    report: dict = {
        "kind": "lpips",
        "distances": [float(x) for x in np.ravel(ours)],
        "finite": bool(np.isfinite(ours).all()),
        "positive": bool((np.ravel(ours) > 0).all()),
    }
    try:
        import lpips as lpips_pkg
        import torch

        net = lpips_pkg.LPIPS(net="vgg")
        net.eval()
        with torch.no_grad():
            theirs = net(
                torch.from_numpy(a * 2 - 1).permute(0, 3, 1, 2),
                torch.from_numpy(b * 2 - 1).permute(0, 3, 1, 2),
            ).reshape(-1).numpy()
        diff = float(np.abs(np.ravel(ours) - theirs).max())
        report["lpips_pkg_max_abs_diff"] = diff
        report["lpips_ok"] = diff < 1e-4
    except ImportError:
        report["lpips_pkg_max_abs_diff"] = None
        report["note"] = (
            "lpips package not importable - our-side distance checks only"
        )
    return report


def main(argv: list[str] | None = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    do_verify = bool(argv) and argv[0] == "verify"
    if do_verify:
        argv = argv[1:]
    if len(argv) != 3 or argv[0] not in ("lpips", "backbone"):
        print(__doc__)
        print(
            "verify mode: python -m freesplat_tpu.scripts.convert_weights"
            " verify {backbone|lpips} SRC.pth DST.npz\n"
            "  converts, then emits DST.npz.verify.json with a forward-"
            "activation diff report (vs timm / the lpips package when "
            "importable; structural + our-side checks otherwise)."
        )
        raise SystemExit(2)
    kind, src, dst = argv
    import torch

    sd = torch.load(src, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if kind == "lpips":
        from ..utils.torch_convert import convert_lpips_vgg

        _save_tree(convert_lpips_vgg(sd), dst)
    else:
        from ..utils.torch_convert import convert_efficientnetv2_s

        params, stats = convert_efficientnetv2_s(sd)
        _save_tree({"params": params, "batch_stats": stats}, dst)
    print(f"wrote {dst}")

    if do_verify:
        import json

        report = (
            verify_lpips(dst, src) if kind == "lpips"
            else verify_backbone(dst, src)
        )
        out = f"{dst}.verify.json"
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
        print(f"wrote {out}")
        bad = (
            not all(s["finite"] for s in report["scales"])
            if kind == "backbone" else not report["finite"]
        )
        golden = report.get(
            "timm_ok" if kind == "backbone" else "lpips_ok"
        )
        if bad or golden is False:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
