"""Gaussian parameter math: quaternions and covariance construction.

Matches the reference numerics of
``/root/reference/src/model/encoder/common/gaussians.py`` (scipy xyzw
quaternion order, R S S^T R^T covariance).
"""
from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(..., 4) xyzw quaternion -> (..., 3, 3) rotation matrix.

    Tolerates unnormalized quaternions (normalizes via the 2/|q|^2 factor).
    """
    i, j, k, r = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / (jnp.sum(quaternions * quaternions, axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(*o.shape[:-1], 3, 3)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) xyzw unit quaternion.

    Branch-free (jit-friendly) Shepperd-style conversion: computes all four
    candidate solutions and selects by the largest pivot.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate quaternions (unnormalized), keyed by pivot.
    qw0 = safe_sqrt(1 + tr)
    c0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), qw0 * qw0], -1) / (
        2 * qw0[..., None]
    )
    qx1 = safe_sqrt(1 + m00 - m11 - m22)
    c1 = jnp.stack([qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (
        2 * qx1[..., None]
    )
    qy2 = safe_sqrt(1 - m00 + m11 - m22)
    c2 = jnp.stack([(m01 + m10), qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / (
        2 * qy2[..., None]
    )
    qz3 = safe_sqrt(1 - m00 - m11 + m22)
    c3 = jnp.stack([(m02 + m20), (m12 + m21), qz3 * qz3, (m10 - m01)], -1) / (
        2 * qz3[..., None]
    )

    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    choice = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, choice[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def matmul3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ (..., 3, 3) written ELEMENTWISE.

    XLA lowers tiny batched matmuls onto the MXU by padding each 3x3 to
    a full tile — at whole-scene sizes (g = 5.9M gaussians) one padded
    operand plans gigabytes and the Gaussian head OOM'd a 16 GB chip
    (r3 hardware finding; same rule as the EWA math in ops/rendering.py:
    'no tiny batched matmuls — write elementwise')."""
    rows = []
    for i in range(3):
        cols = [
            a[..., i, 0] * b[..., 0, j]
            + a[..., i, 1] * b[..., 1, j]
            + a[..., i, 2] * b[..., 2, j]
            for j in range(3)
        ]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def build_covariance(scale: jnp.ndarray, rotation_xyzw: jnp.ndarray) -> jnp.ndarray:
    """3D covariance Sigma = R diag(s)^2 R^T.  scale (..., 3), quat (..., 4)."""
    rotation = quaternion_to_matrix(rotation_xyzw)
    rs = rotation * scale[..., None, :]  # R @ diag(s)
    return matmul3(rs, jnp.swapaxes(rs, -1, -2))


def covariance_upper_triangle(cov: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 6) upper triangular (row-major order)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )
