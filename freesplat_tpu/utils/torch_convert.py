"""Torch checkpoint -> Flax parameter conversion.

The reference relies on two pretrained torch models that cannot be shipped
in this offline image: timm's ``tf_efficientnetv2_s_in21ft1k``
(``encoder_freesplat.py:116-122``) and the ``lpips`` package's VGG16
(``loss_lpips.py:33``).  These converters map their state dicts onto
``models/backbone.EfficientNetV2S`` and ``training/lpips.LPIPS`` parameter
trees.  Inputs are dicts of numpy arrays (load a ``.pth`` with
``torch.load(..., map_location='cpu')`` and call ``{k: v.numpy()}``).

Conventions: torch conv weight (O, I, kh, kw) -> flax kernel
(kh, kw, I, O); depthwise (O, 1, kh, kw) -> (kh, kw, 1, O); linear
(O, I) -> (I, O).
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from ..models.backbone import EFFNETV2_S_CONFIG


class _KeyTracker(dict):
    """Records which state-dict keys a converter consumed, so ``strict``
    conversion can fail loudly on anything unmapped (a silently dropped
    pretrained weight is the worst possible conversion bug)."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        super().__init__(sd)
        self.consumed: set[str] = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):  # membership probes don't consume
        return super().__contains__(key)


# Keys a timm/lpips checkpoint carries that the features_only /
# frozen-loss models legitimately never read.
_IGNORABLE_SUFFIXES = (".num_batches_tracked",)
_IGNORABLE_PREFIXES = ("conv_head.", "classifier.", "bn2.")


def _check_consumed(tracker: _KeyTracker, what: str) -> None:
    unmapped = [
        k
        for k in tracker
        if k not in tracker.consumed
        and not k.endswith(_IGNORABLE_SUFFIXES)
        and not k.startswith(_IGNORABLE_PREFIXES)
    ]
    if unmapped:
        raise ValueError(
            f"{what}: {len(unmapped)} state-dict keys were NOT consumed by "
            f"the converter (architecture mismatch?): {sorted(unmapped)[:20]}"
            + (" ..." if len(unmapped) > 20 else "")
        )


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _bn(prefix: str, sd: Mapping[str, np.ndarray]):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def convert_efficientnetv2_s(
    sd: Mapping[str, np.ndarray],
    strict: bool = True,
) -> tuple[dict, dict]:
    """timm tf_efficientnetv2_s state dict -> (params, batch_stats) trees
    for ``EfficientNetV2S`` (to be placed under the module's scope name).

    With ``strict`` (default), raises if any provided key is neither
    consumed nor a known-ignorable head/counter key — a missing key
    already raises KeyError, so strict conversion is loud in both
    directions.  The expected key/shape manifest is frozen in
    ``tests/fixtures/timm_tf_efficientnetv2_s_manifest.json``.
    """
    sd = _KeyTracker(sd)
    params: dict = {}
    stats: dict = {}

    params["conv_stem"] = {"kernel": _conv(sd["conv_stem.weight"])}
    p, s = _bn("bn1", sd)
    params["bn_stem"] = {"bn": p}
    stats["bn_stem"] = {"bn": s}

    for si, (btype, _k, _s, expand, _ch, n_blocks, se_ratio) in enumerate(
        EFFNETV2_S_CONFIG
    ):
        for bi in range(n_blocks):
            t = f"blocks.{si}.{bi}"
            name = f"stage{si}_block{bi}"
            bp: dict = {}
            bs: dict = {}
            if btype == "fused":
                if expand == 1:  # timm ConvBnAct
                    bp["conv"] = {"kernel": _conv(sd[f"{t}.conv.weight"])}
                    p, s = _bn(f"{t}.bn1", sd)
                    bp["bn1"] = {"bn": p}
                    bs["bn1"] = {"bn": s}
                else:  # timm EdgeResidual
                    bp["conv_exp"] = {
                        "kernel": _conv(sd[f"{t}.conv_exp.weight"])
                    }
                    p, s = _bn(f"{t}.bn1", sd)
                    bp["bn1"] = {"bn": p}
                    bs["bn1"] = {"bn": s}
                    bp["conv_pwl"] = {
                        "kernel": _conv(sd[f"{t}.conv_pwl.weight"])
                    }
                    p, s = _bn(f"{t}.bn2", sd)
                    bp["bn2"] = {"bn": p}
                    bs["bn2"] = {"bn": s}
            else:  # timm InvertedResidual
                bp["conv_pw"] = {"kernel": _conv(sd[f"{t}.conv_pw.weight"])}
                p, s = _bn(f"{t}.bn1", sd)
                bp["bn1"] = {"bn": p}
                bs["bn1"] = {"bn": s}
                bp["conv_dw"] = {"kernel": _conv(sd[f"{t}.conv_dw.weight"])}
                p, s = _bn(f"{t}.bn2", sd)
                bp["bn2"] = {"bn": p}
                bs["bn2"] = {"bn": s}
                if se_ratio > 0:
                    bp["se"] = {
                        "reduce": {
                            "kernel": _conv(sd[f"{t}.se.conv_reduce.weight"]),
                            "bias": sd[f"{t}.se.conv_reduce.bias"],
                        },
                        "expand": {
                            "kernel": _conv(sd[f"{t}.se.conv_expand.weight"]),
                            "bias": sd[f"{t}.se.conv_expand.bias"],
                        },
                    }
                bp["conv_pwl"] = {"kernel": _conv(sd[f"{t}.conv_pwl.weight"])}
                p, s = _bn(f"{t}.bn3", sd)
                bp["bn3"] = {"bn": p}
                bs["bn3"] = {"bn": s}
            params[name] = bp
            if bs:
                stats[name] = bs
    if strict:
        _check_consumed(sd, "convert_efficientnetv2_s")
    return params, stats


# torchvision vgg16.features conv layer indices per block.
_VGG16_CONV_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))


def convert_lpips_vgg(
    sd: Mapping[str, np.ndarray], strict: bool = True
) -> dict:
    """lpips-package state dict (net.* + lins.*) -> LPIPS params tree.

    ``strict``: raise on provided-but-unconsumed keys (see
    ``convert_efficientnetv2_s``)."""
    sd = _KeyTracker(sd)
    vgg: dict = {}
    for bi, conv_ids in enumerate(_VGG16_CONV_IDX):
        for ci, idx in enumerate(conv_ids):
            # lpips names the vgg slices net.slice{1..5}.<features idx>.
            key_w = f"net.slice{bi + 1}.{idx}.weight"
            key_b = f"net.slice{bi + 1}.{idx}.bias"
            if key_w not in sd:  # plain torchvision layout fallback
                key_w = f"features.{idx}.weight"
                key_b = f"features.{idx}.bias"
            vgg[f"conv{bi}_{ci}"] = {
                "kernel": _conv(sd[key_w]),
                "bias": sd[key_b],
            }
    params: dict = {"vgg": vgg}
    for li in range(5):
        key = f"lins.{li}.model.1.weight"
        if key not in sd:
            key = f"lin{li}.model.1.weight"
        params[f"lin{li}"] = {"kernel": _conv(sd[key])}
    if strict:
        _check_consumed(sd, "convert_lpips_vgg")
    return {"params": params}
