"""Vector-graphics drawing (reference src/visualization/drawing/)."""
import numpy as np

from freesplat_tpu.utils.drawing import (
    draw_cameras,
    draw_lines,
    draw_points,
)


def test_draw_points_disc_and_ring():
    img = np.zeros((32, 32, 3), np.float32)
    out = np.asarray(
        draw_points(img, [[16.0, 16.0]], color=(1.0, 0.0, 0.0), radius=5.0)
    )
    assert out[16, 16, 0] > 0.9 and out[16, 16, 1] == 0.0  # center is red
    assert out[16, 28].sum() == 0.0  # far outside untouched
    # Antialiased edge: partial coverage strictly between 0 and 1.
    ring = np.asarray(
        draw_points(
            img, [[16.0, 16.0]], color=(0.0, 1.0, 0.0), radius=10.0,
            inner_radius=8.0,
        )
    )
    assert ring[16, 16].sum() == 0.0  # hole
    assert ring[16, 25, 1] > 0.9  # on the ring (d=9 from center)


def test_draw_lines_caps_and_priority():
    img = np.zeros((24, 48, 3), np.float32)
    out = np.asarray(
        draw_lines(
            img, [[8.0, 12.0]], [[40.0, 12.0]], color=(0.0, 0.0, 1.0),
            width=4.0,
        )
    )
    assert out[12, 24, 2] > 0.9  # mid-line
    assert out[12, 2].sum() == 0.0  # before the start (beyond round cap)
    # Round cap extends ~width/2 past the endpoint; butt does not.
    butt = np.asarray(
        draw_lines(
            img, [[8.0, 12.0]], [[40.0, 12.0]], color=(0.0, 0.0, 1.0),
            width=4.0, cap="butt",
        )
    )
    assert out[12, 41, 2] > 0.5 and butt[12, 41, 2] < 0.5
    # Highest-index primitive wins on overlap (reference lines.py:72-79).
    both = np.asarray(
        draw_lines(
            img,
            [[8.0, 12.0], [8.0, 12.0]],
            [[40.0, 12.0], [40.0, 12.0]],
            color=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            width=4.0,
        )
    )
    assert both[12, 24, 1] > 0.9 and both[12, 24, 0] < 0.1


def test_draw_lines_world_ranges():
    img = np.zeros((20, 20, 3), np.float32)
    out = np.asarray(
        draw_lines(
            img, [[-1.0, 0.0]], [[1.0, 0.0]], color=(1.0, 1.0, 1.0),
            width=2.0, x_range=(-1.0, 1.0), y_range=(-1.0, 1.0),
        )
    )
    # The world x-axis maps to the horizontal mid-row of the image.
    assert out[10, 10].sum() > 2.5
    assert out[2, 10].sum() == 0.0


def test_draw_cameras_projections():
    extr = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    extr[:, 0, 3] = [0.0, 1.0, 2.0]
    intr = np.tile(
        np.asarray(
            [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], np.float32
        ),
        (3, 1, 1),
    )
    color = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    views = draw_cameras(64, extr, intr, color, near=0.5, far=4.0)
    assert views.shape == (3, 64, 64, 3)
    assert np.isfinite(views).all()
    # Every view shows some geometry, and each camera's color appears.
    for v in views:
        assert v.sum() > 0.0
    reds = views[..., 0].sum()
    greens = views[..., 1].sum()
    blues = views[..., 2].sum()
    assert reds > 0 and greens > 0 and blues > 0
