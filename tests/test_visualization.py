"""Tests for visualization utilities and camera trajectories."""
import numpy as np
import jax.numpy as jnp

from freesplat_tpu.utils.camera_trajectory import (
    generate_spin,
    generate_wobble,
    interpolate_extrinsics,
    interpolate_intrinsics,
)
from freesplat_tpu.utils.visualization import (
    add_border,
    add_label,
    apply_color_map,
    depth_to_color,
    draw_lines,
    draw_points,
    hcat,
    save_video,
    vcat,
)


def test_hcat_vcat_border():
    a = np.zeros((10, 20, 3), np.float32)
    b = np.ones((14, 8, 3), np.float32)
    h = hcat(a, b, gap=4)
    assert h.shape == (14, 32, 3)
    v = vcat(a, b, gap=2)
    assert v.shape == (26, 20, 3)
    bd = add_border(a, 3)
    assert bd.shape == (16, 26, 3)


def test_add_label():
    img = np.zeros((20, 60, 3), np.float32)
    out = add_label(img, "hello")
    assert out.shape[1] == 60
    assert out.shape[0] > 20
    assert out.max() > 0.9  # white label bar present


def test_color_maps():
    vals = np.linspace(0, 1, 16).reshape(4, 4)
    rgb = apply_color_map(vals)
    assert rgb.shape == (4, 4, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    depth = np.linspace(0.5, 10, 16).reshape(4, 4)
    d = depth_to_color(depth, near=0.5, far=10)
    assert d.shape == (4, 4, 3)


def test_drawing():
    img = np.zeros((32, 32, 3), np.float32)
    out = draw_points(img, np.array([[0.5, 0.5]]), color=(1, 0, 0), radius=2)
    assert out[16, 16, 0] > 0.9
    out2 = draw_lines(
        img, np.array([[0.0, 0.5]]), np.array([[1.0, 0.5]]), color=(0, 1, 0)
    )
    assert out2[16, :, 1].max() > 0.9


def test_save_video(tmp_path):
    frames = [np.full((8, 8, 3), i / 4, np.float32) for i in range(5)]
    path = tmp_path / "vid.gif"
    save_video(frames, path, fps=10)
    assert path.exists() and path.stat().st_size > 0


def test_profiling_helpers(tmp_path):
    """trace() is a usable context (no-op when disabled; on CPU it writes
    a profile dir) and annotate() nests inside jitted regions."""
    import os

    from freesplat_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path / "t"), enabled=False):
        pass  # disabled: nothing written
    assert not (tmp_path / "t").exists()

    import jax.numpy as jnp

    with trace(str(tmp_path / "t2")):
        with annotate("smoke"):
            float(jnp.ones(4).sum())
    assert (tmp_path / "t2").exists()
    assert any(os.scandir(tmp_path / "t2"))


def test_draw_cameras_and_render_cameras():
    """Frustum wireframes land inside the image on all three axis planes
    (reference drawing/cameras.py draw_cameras + render_cameras)."""
    import numpy as np

    from freesplat_tpu.utils.camera_viz import draw_cameras, render_cameras

    b = 3
    extr = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    extr[:, 0, 3] = np.linspace(0, 1, b)
    intr = np.tile(
        np.array([[1.1, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], np.float32),
        (b, 1, 1),
    )
    color = np.ones((b, 3), np.float32)
    out = draw_cameras(
        64, extr, intr, color,
        near=np.full(b, 0.5, np.float32), far=np.full(b, 5.0, np.float32),
    )
    assert out.shape[0] == 3 and out.shape[-1] == 3
    for i in range(3):
        assert out[i].max() > 0.2  # something was drawn on every plane

    batch = {
        "context": {
            "extrinsics": extr[None, :2],
            "intrinsics": intr[None, :2],
            "near": np.full((1, 2), 0.5, np.float32),
            "far": np.full((1, 2), 5.0, np.float32),
        },
        "target": {
            "extrinsics": extr[None, 2:],
            "intrinsics": intr[None, 2:],
            "near": np.full((1, 1), 0.5, np.float32),
            "far": np.full((1, 1), 5.0, np.float32),
        },
    }
    cams = render_cameras(batch, resolution=64)
    assert cams.shape[0] == 3
    # Targets are red: some pixels have R >> G/B.
    reds = (cams[..., 0] > 0.8) & (cams[..., 1] < 0.3)
    assert reds.any()


def test_wobble_stays_near_origin():
    extr = jnp.eye(4)
    t = jnp.linspace(0, 1, 8)
    traj = generate_wobble(extr, jnp.asarray(0.1), t)
    assert traj.shape == (8, 4, 4)
    offsets = np.asarray(traj[:, :3, 3])
    assert np.linalg.norm(offsets, axis=-1).max() <= 0.15
    # Rotation part untouched.
    np.testing.assert_allclose(
        np.asarray(traj[:, :3, :3]), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-6
    )


def test_interpolation_endpoints():
    import scipy.spatial.transform as st

    r = st.Rotation.from_euler("y", 0.7).as_matrix()
    a = np.eye(4, dtype=np.float32)
    b = np.eye(4, dtype=np.float32)
    b[:3, :3] = r
    b[:3, 3] = [1, 2, 3]
    t = np.array([0.0, 0.5, 1.0])
    traj = interpolate_extrinsics(a, b, t)
    np.testing.assert_allclose(traj[0], a, atol=1e-5)
    np.testing.assert_allclose(traj[-1], b, atol=1e-5)
    # Midpoint rotation is half the angle.
    mid = st.Rotation.from_matrix(traj[1, :3, :3]).magnitude()
    np.testing.assert_allclose(mid, 0.35, atol=1e-5)

    ka = jnp.eye(3)
    kb = 2 * jnp.eye(3)
    ks = interpolate_intrinsics(ka, kb, jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(ks[1]), 1.5 * np.eye(3), atol=1e-6)


def test_spin_looks_at_origin():
    traj = generate_spin(12, elevation_deg=20.0, radius=3.0)
    assert traj.shape == (12, 4, 4)
    for e in traj:
        # Camera z-axis (forward) points at the origin.
        fwd = e[:3, 2]
        to_origin = -e[:3, 3] / np.linalg.norm(e[:3, 3])
        np.testing.assert_allclose(fwd, to_origin, atol=1e-5)
        # Valid rotation.
        np.testing.assert_allclose(
            e[:3, :3] @ e[:3, :3].T, np.eye(3), atol=1e-5
        )
