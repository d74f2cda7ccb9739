"""Tests for epipolar geometry + evaluation index generation."""
import json

import jax.numpy as jnp
import numpy as np

from freesplat_tpu.evaluation.index_generator import (
    EvaluationIndexGenerator,
    EvaluationIndexGeneratorCfg,
    view_overlap,
)
from freesplat_tpu.geometry.epipolar import get_depth, lift_to_3d, project_rays
from freesplat_tpu.geometry.projection import get_world_rays, sample_image_grid


def cam(tx=0.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    e = np.eye(4, dtype=np.float32)
    e[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    e[0, 3] = tx
    return jnp.asarray(e)


INTR = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32)


def test_project_rays_identical_cameras_full_overlap():
    xy, _ = sample_image_grid((8, 8))
    xy = xy.reshape(-1, 2)
    origins, dirs = get_world_rays(xy, cam(), INTR)
    proj = project_rays(origins, dirs, cam(), INTR)
    # A camera's own rays all overlap its own image.
    assert float(jnp.mean(proj.overlaps_image.astype(jnp.float32))) > 0.95


def test_project_rays_opposite_cameras_no_overlap():
    xy, _ = sample_image_grid((8, 8))
    xy = xy.reshape(-1, 2)
    origins, dirs = get_world_rays(xy, cam(), INTR)
    behind = cam(yaw=np.pi)  # looking the opposite way from same point
    proj = project_rays(origins, dirs, behind, INTR)
    assert float(jnp.mean(proj.overlaps_image.astype(jnp.float32))) < 0.2


def test_lift_to_3d_recovers_depth():
    # A ray through the image center; a second camera observes the point.
    origins = jnp.array([0.0, 0.0, 0.0])
    dirs = jnp.array([0.0, 0.0, 1.0])
    other = cam(tx=1.0)
    point = jnp.array([0.0, 0.0, 4.0])
    # Project the point into the other camera to get its xy there.
    from freesplat_tpu.geometry.projection import project

    xy, _ = project(point[None], other, INTR)
    lifted = lift_to_3d(origins, dirs, xy[0], other, INTR)
    np.testing.assert_allclose(np.asarray(lifted), [0, 0, 4.0], atol=1e-3)
    d = get_depth(origins, dirs, xy[0], other, INTR)
    np.testing.assert_allclose(float(d), 4.0, atol=1e-3)


def test_view_overlap_monotone_in_rotation():
    overlaps = []
    for yaw in (0.0, 0.3, 0.8, 1.6):
        a, b = view_overlap(cam(), INTR, cam(yaw=yaw), INTR, (32, 32), stride=4)
        overlaps.append(min(a, b))
    assert overlaps[0] > 0.9
    assert all(overlaps[i] >= overlaps[i + 1] - 1e-3 for i in range(3))
    assert overlaps[-1] < 0.3


def test_index_generator_produces_valid_entries(tmp_path):
    # A slowly rotating camera track: nearby frames overlap a lot, distant
    # frames little.
    n = 40
    extr = np.stack([np.asarray(cam(yaw=0.045 * i)) for i in range(n)])
    intr = np.tile(np.asarray(INTR), (n, 1, 1))
    gen = EvaluationIndexGenerator(
        EvaluationIndexGeneratorCfg(
            min_distance=3, max_distance=30, min_overlap=0.35,
            max_overlap=0.8, num_target_views=3, subsample=4,
        ),
        seed=0,
    )
    gen.process_scene("scene_x", extr, intr, (32, 32))
    entry = gen.index["scene_x"]
    assert entry is not None
    left, right = entry.context
    assert right - left >= 3
    assert all(left <= t <= right for t in entry.target)
    assert len(set(entry.target)) == len(entry.target)

    path = gen.save_index(tmp_path)
    data = json.loads(path.read_text())
    assert data["scene_x"]["context"] == [left, right]
