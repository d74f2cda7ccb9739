"""Real spherical harmonics: evaluation and rotation (degrees 0..3).

The basis order and constants match the INRIA 3DGS rasterizer convention
(the spec the reference rasterizer implements; see
``/root/reference/src/model/decoder/cuda_splatting.py`` call sites, where SH
coefficients are passed in exactly this layout).

Rotation is done *numerically but exactly*: each band's (2l+1)x(2l+1)
rotation matrix is recovered by evaluating the basis at a fixed set of
sample directions and solving a tiny least-squares system whose pseudo-
inverse is a compile-time constant.  This is self-consistent with our own
basis definition by construction (no Wigner-D convention pitfalls, no e3nn
dependency — replaces ``/root/reference/src/misc/sh_rotation.py``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_basis(directions: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate the SH basis at unit ``directions`` (..., 3) -> (..., (deg+1)^2)."""
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    out = [jnp.full_like(x, SH_C0)]
    if degree >= 1:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(sh: jnp.ndarray, directions: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH colors.

    sh: (..., channels, (deg+1)^2) coefficients; directions: (..., 3) unit.
    Returns (..., channels) = basis . coeffs (no +0.5 offset / clamping —
    the rasterizer applies that, matching the CUDA kernel's computeColorFromSH).
    """
    basis = eval_sh_basis(directions, degree)
    # Elementwise-sum form: a batched (c, d) @ (d,) einsum pads each tiny
    # matrix to an MXU tile on TPU.
    return jnp.sum(sh * basis[..., None, :], axis=-1)


def _numpy_eval_basis(dirs: np.ndarray, degree: int) -> np.ndarray:
    """Pure-numpy basis evaluation (import-time constants only — must not
    touch a device)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [np.full_like(x, SH_C0)]
    if degree >= 1:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz, xy = x * x, y * y, z * z, x * y
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return np.stack(out, axis=-1)


def _sample_directions(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


# Fixed sample directions and per-band pseudo-inverses (compile-time consts).
_N_SAMPLES = 32
_DIRS = _sample_directions(_N_SAMPLES)
_BAND_PINV: dict[int, np.ndarray] = {}
for _l in range(4):
    _basis = _numpy_eval_basis(_DIRS, _l)[:, _l**2 : (_l + 1) ** 2]  # (K, 2l+1)
    _BAND_PINV[_l] = np.linalg.pinv(_basis.T)  # (K, 2l+1): pinv of (2l+1, K)


def band_rotation_matrices(rotations: jnp.ndarray, degree: int) -> list[jnp.ndarray]:
    """Per-band real-SH rotation matrices for ``rotations`` (..., 3, 3).

    Band matrix M_l satisfies: basis_l(R^T d) = M_l @ basis_l(d), so
    coefficients rotate as c' = M_l @ c ... i.e. the function f'(d) = f(R^T d)
    ("rotate the lobe by R").
    """
    mats = []
    for l in range(degree + 1):
        dirs = jnp.asarray(_DIRS, dtype=rotations.dtype)  # (K, 3)
        rot_dirs = jnp.einsum("...ij,kj->...ki", jnp.swapaxes(rotations, -1, -2), dirs)
        basis_rot = eval_sh_basis(rot_dirs, degree=l)[..., l**2 : (l + 1) ** 2]
        # M = B_rot^T @ pinv(B^T):  M[i, j] = sum_k B_rot[k, i] * PINV[k, j]
        pinv = jnp.asarray(_BAND_PINV[l], dtype=rotations.dtype)  # (K, 2l+1)
        mats.append(jnp.einsum("...ki,kj->...ij", basis_rot, pinv))
    return mats


def rotate_sh(sh_coefficients: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """Rotate SH coefficients (..., n) by rotation matrices (..., 3, 3).

    Defined so that ``eval_sh(rotate_sh(c, R), R @ d) == eval_sh(c, d)``:
    rotating coefficients by R makes the lobe follow directions rotated by R.
    (TPU-native replacement for the reference's e3nn wigner_D path,
    ``/root/reference/src/misc/sh_rotation.py:10-30``.)
    """
    n = sh_coefficients.shape[-1]
    degree = int(round(np.sqrt(n))) - 1
    assert (degree + 1) ** 2 == n, f"invalid SH coefficient count {n}"
    out = []
    for l, m in enumerate(band_rotation_matrices(rotations, degree)):
        c = sh_coefficients[..., l**2 : (l + 1) ** 2]
        # b(R^T e) = M_l b(e)  =>  c . b(R^T e) = (M_l^T c) . b(e)
        out.append(jnp.einsum("...ji,...j->...i", m, c))
    return jnp.concatenate(out, axis=-1)
