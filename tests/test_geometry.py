"""Tests for geometry/projection.py against analytic cases and the
conventions documented in /root/reference/src/geometry/projection.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesplat_tpu.geometry.projection import (
    get_fov,
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    intersect_rays,
    project,
    sample_image_grid,
    unproject,
)


def make_intrinsics(fx=1.2, fy=1.5, cx=0.5, cy=0.5):
    return jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=jnp.float32)


def random_pose(key):
    from scipy.spatial.transform import Rotation as R

    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    rot = R.random(random_state=rng).as_matrix()
    t = rng.normal(size=3)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot
    pose[:3, 3] = t
    return jnp.asarray(pose)


def test_homogenize():
    p = jnp.ones((2, 3))
    assert homogenize_points(p).shape == (2, 4)
    assert float(homogenize_points(p)[0, 3]) == 1.0
    assert float(homogenize_vectors(p)[0, 3]) == 0.0


def test_project_unproject_roundtrip():
    key = jax.random.PRNGKey(0)
    intr = make_intrinsics()
    extr = random_pose(key)
    coords = jax.random.uniform(key, (64, 2), minval=0.1, maxval=0.9)
    z = jax.random.uniform(key, (64,), minval=0.5, maxval=5.0)
    cam_pts = unproject(coords, z, intr)
    world = jnp.einsum("ij,nj->ni", extr, homogenize_points(cam_pts))[:, :3]
    xy, in_front = project(world, extr, intr)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(coords), atol=1e-4)
    assert bool(jnp.all(in_front))


def test_camera_center_projects_forward():
    intr = make_intrinsics()
    extr = jnp.eye(4)
    pt = jnp.array([[0.0, 0.0, 2.0]])
    xy, in_front = project(pt, extr, intr)
    np.testing.assert_allclose(np.asarray(xy), [[0.5, 0.5]], atol=1e-6)
    assert bool(in_front[0])


def test_sample_image_grid_centers():
    coords, idx = sample_image_grid((2, 4))
    assert coords.shape == (2, 4, 2)
    assert idx.shape == (2, 4, 2)
    # coords are xy: coords[i, j] = ((j + .5) / w, (i + .5) / h)
    np.testing.assert_allclose(np.asarray(coords[0, 0]), [0.125, 0.25])
    np.testing.assert_allclose(np.asarray(coords[1, 3]), [0.875, 0.75])
    np.testing.assert_array_equal(np.asarray(idx[1, 3]), [1, 3])


def test_world_rays_unit_norm_and_origin():
    key = jax.random.PRNGKey(1)
    intr = make_intrinsics()
    extr = random_pose(key)
    coords, _ = sample_image_grid((6, 8))
    origins, dirs = get_world_rays(coords, extr, intr)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(origins[0, 0]), np.asarray(extr[:3, 3]), atol=1e-6
    )


def test_rays_project_back():
    """Marching along a pixel ray and projecting back recovers the pixel."""
    key = jax.random.PRNGKey(2)
    intr = make_intrinsics()
    extr = random_pose(key)
    coords, _ = sample_image_grid((4, 4))
    origins, dirs = get_world_rays(coords, extr, intr)
    pts = origins + 3.0 * dirs
    xy, in_front = project(pts, extr, intr)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(coords), atol=1e-4)
    assert bool(jnp.all(in_front))


def test_get_fov_pinhole():
    # fx normalized: fov_x = 2*atan(0.5/fx)
    intr = make_intrinsics(fx=0.8, fy=1.0)
    fov = np.asarray(get_fov(intr[None])[0])
    np.testing.assert_allclose(fov[0], 2 * np.arctan2(0.5, 0.8), atol=1e-5)
    np.testing.assert_allclose(fov[1], 2 * np.arctan2(0.5, 1.0), atol=1e-5)


def test_intersect_rays():
    o1 = jnp.array([1.0, 0.0, 0.0])
    d1 = jnp.array([-1.0, 0.0, 0.0])
    o2 = jnp.array([0.0, 1.0, 0.0])
    d2 = jnp.array([0.0, -1.0, 0.0])
    p = intersect_rays(o1, d1, o2, d2)
    np.testing.assert_allclose(np.asarray(p), [0.0, 0.0, 0.0], atol=1e-5)
    # Parallel rays -> inf
    p2 = intersect_rays(o1, d1, o2, d1)
    assert np.all(np.asarray(p2) > 1e9)


def test_project_is_differentiable():
    intr = make_intrinsics()
    extr = jnp.eye(4)

    def f(pt):
        xy, _ = project(pt, extr, intr)
        return jnp.sum(xy)

    g = jax.grad(f)(jnp.array([[0.1, 0.2, 2.0]]))
    assert np.all(np.isfinite(np.asarray(g)))
