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

Trees are stored as flat "a/b/c" keypath arrays (same format as
training/lpips.save_lpips_params).
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


def main(argv: list[str] | None = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3 or argv[0] not in ("lpips", "backbone"):
        print(__doc__)
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


if __name__ == "__main__":
    main()
