"""Tests for quaternion/covariance math and spherical harmonics."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from freesplat_tpu.ops.gaussians import (
    build_covariance,
    covariance_upper_triangle,
    matrix_to_quaternion,
    quaternion_to_matrix,
)
from freesplat_tpu.ops.sh import eval_sh, eval_sh_basis, num_sh_coeffs, rotate_sh


def test_quaternion_matches_scipy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(quaternion_to_matrix(jnp.asarray(q, dtype=jnp.float32)))
    theirs = R.from_quat(q).as_matrix()  # scipy uses xyzw too
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    m = quaternion_to_matrix(jnp.asarray(q, dtype=jnp.float32))
    q2 = matrix_to_quaternion(m)
    m2 = quaternion_to_matrix(q2)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-4)


def test_build_covariance_analytic():
    # Identity rotation: covariance = diag(s^2).
    s = jnp.array([1.0, 2.0, 3.0])
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    cov = np.asarray(build_covariance(s, q))
    np.testing.assert_allclose(cov, np.diag([1.0, 4.0, 9.0]), atol=1e-6)

    # Rotated covariance keeps eigenvalues = s^2.
    rng = np.random.default_rng(2)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    cov = np.asarray(build_covariance(s, jnp.asarray(q, dtype=jnp.float32)))
    eig = np.sort(np.linalg.eigvalsh(cov))
    np.testing.assert_allclose(eig, [1.0, 4.0, 9.0], atol=1e-4)


def test_covariance_upper_triangle():
    cov = jnp.arange(9.0).reshape(3, 3)
    cov = 0.5 * (cov + cov.T)
    ut = np.asarray(covariance_upper_triangle(cov))
    np.testing.assert_allclose(
        ut, [cov[0, 0], cov[0, 1], cov[0, 2], cov[1, 1], cov[1, 2], cov[2, 2]]
    )


def test_sh_basis_constants():
    # Degree-0 is constant, degree-1 terms are (-C1 y, C1 z, -C1 x).
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    basis = np.asarray(eval_sh_basis(d, 1))
    np.testing.assert_allclose(basis[0], [0.28209479, 0.0, 0.48860252, 0.0], atol=1e-6)
    np.testing.assert_allclose(basis[1], [0.28209479, 0.0, 0.0, -0.48860252], atol=1e-6)


def test_sh_orthonormality():
    """Monte-Carlo check that the basis is orthonormal over the sphere."""
    rng = np.random.default_rng(3)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    basis = np.asarray(eval_sh_basis(jnp.asarray(d, dtype=jnp.float32), 3))
    gram = 4 * np.pi * basis.T @ basis / len(d)
    np.testing.assert_allclose(gram, np.eye(num_sh_coeffs(3)), atol=0.05)


def test_rotate_sh_consistency():
    """eval(rotate_sh(c, R), R @ d) == eval(c, d) for all degrees."""
    rng = np.random.default_rng(4)
    for degree in range(4):
        n = num_sh_coeffs(degree)
        c = jnp.asarray(rng.normal(size=(3, n)), dtype=jnp.float32)
        rot = jnp.asarray(
            R.random(random_state=rng).as_matrix(), dtype=jnp.float32
        )
        d = rng.normal(size=(50, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d, dtype=jnp.float32)

        before = eval_sh(c[None], d[:, None, :].repeat(1, 1), degree)
        c_rot = rotate_sh(c, rot)
        d_rot = jnp.einsum("ij,nj->ni", rot, d)
        after = eval_sh(c_rot[None], d_rot[:, None, :].repeat(1, 1), degree)
        np.testing.assert_allclose(
            np.asarray(after), np.asarray(before), atol=2e-4
        )


def test_rotate_sh_identity():
    rng = np.random.default_rng(5)
    c = jnp.asarray(rng.normal(size=(16,)), dtype=jnp.float32)
    out = rotate_sh(c, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=1e-5)


def test_rotate_sh_batched():
    rng = np.random.default_rng(6)
    c = jnp.asarray(rng.normal(size=(8, 9)), dtype=jnp.float32)
    rots = jnp.asarray(
        R.random(8, random_state=rng).as_matrix(), dtype=jnp.float32
    )
    out = rotate_sh(c, rots)
    assert out.shape == (8, 9)
    single = rotate_sh(c[3], rots[3])
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(single), atol=1e-5)


def test_discrete_distribution_sampling():
    import jax
    from freesplat_tpu.ops.discrete_distribution import (
        gather_discrete_topk,
        sample_discrete_distribution,
    )

    pdf = jnp.array([[0.0, 0.0, 1.0, 0.0], [0.25, 0.25, 0.25, 0.25]])
    idx, dens = sample_discrete_distribution(pdf, jax.random.PRNGKey(0), 64)
    assert idx.shape == (2, 64)
    # Deterministic row always picks bucket 2.
    assert np.all(np.asarray(idx[0]) == 2)
    np.testing.assert_allclose(np.asarray(dens[0]), 1.0, atol=1e-6)
    # Uniform row covers all buckets.
    assert len(set(np.asarray(idx[1]).tolist())) == 4

    tidx, tdens = gather_discrete_topk(pdf, 2)
    assert int(tidx[0, 0]) == 2
    np.testing.assert_allclose(np.asarray(tdens[1]), 0.25, atol=1e-6)
