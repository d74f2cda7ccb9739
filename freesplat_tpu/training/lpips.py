"""LPIPS perceptual distance (VGG16 backbone) in Flax.

Parity target: the ``lpips`` pip package's ``LPIPS(net='vgg')`` used by the
reference loss (``src/loss/loss_lpips.py``) and metrics
(``src/evaluation/metrics.py:22-33``): VGG16 features at relu1_2, relu2_2,
relu3_3, relu4_3, relu5_3, unit-normalized over channels, squared
difference, 1x1 linear heads, spatial mean, summed over layers.  Inputs in
[0, 1] are shifted/scaled by the LPIPS constants.

Pretrained VGG + LPIPS linear weights are not bundled (offline image);
``utils/torch_convert.py`` maps a torch ``lpips`` checkpoint onto this
module.  With random init this is still a valid (untrained) perceptual
metric for smoke tests; training falls back to MSE-only when no weights
are supplied.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

# VGG16 conv plan: (channels, num convs) per block.
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# lpips package normalization constants.
_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = []
        for bi, (ch, n_convs) in enumerate(_VGG_BLOCKS):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{bi}_{ci}")(x)
                x = nn.relu(x)
            feats.append(x)
            if bi < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """(b, h, w, 3) images in [0, 1] -> (b,) LPIPS distances."""

        def norm_input(x):
            x = 2.0 * x - 1.0  # lpips normalize=True convention
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(name="vgg")
        f0 = vgg(norm_input(img0))
        f1 = vgg(norm_input(img1))
        total = 0.0
        for li, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            lin = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{li}"
            )(diff)
            total = total + jnp.mean(lin[..., 0], axis=(-1, -2))
        return total


def save_lpips_params(params: dict, path: str) -> None:
    """Serialize an LPIPS variables tree to .npz (keypaths joined by /)."""
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)


def load_lpips_params(path: str) -> dict:
    """Load LPIPS variables from ``path``: a .npz written by
    ``save_lpips_params``, or a torch state dict from the ``lpips``
    package / torchvision (converted via utils/torch_convert)."""
    if str(path).endswith(".npz"):
        data = np.load(path)
        tree: dict = {}
        for key in data.files:
            node = tree
            *parents, leaf = key.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = jnp.asarray(data[key])
        return tree
    import torch  # CPU-only deserialization

    from ..utils.torch_convert import convert_lpips_vgg

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    return convert_lpips_vgg(sd)
