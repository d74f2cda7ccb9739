"""Legacy epipolar sampler stack (pairings + EpipolarSampler)."""
import jax.numpy as jnp
import numpy as np

from freesplat_tpu.geometry.pairings import (
    generate_heterogeneous_index,
    generate_heterogeneous_index_transpose,
)
from freesplat_tpu.models.epipolar_sampler import EpipolarSampler


def test_pairings_small_n():
    s, o = generate_heterogeneous_index(2)
    assert o.tolist() == [[1], [0]] and s.tolist() == [[0], [1]]
    s, o = generate_heterogeneous_index(3)
    assert o.tolist() == [[1, 2], [0, 2], [0, 1]]

    # Transpose inverts the pairing: x[t_v[i,k], t_ov[i,k]] is a slot where
    # some view j looks at i.
    for n in (2, 3):
        _, other = generate_heterogeneous_index(n)
        t_v, t_ov = generate_heterogeneous_index_transpose(n)
        for i in range(n):
            for k in range(other.shape[1]):
                assert other[t_v[i, k], t_ov[i, k]] == i


def test_pairings_sliding_window():
    _, other = generate_heterogeneous_index(8)
    assert other.shape == (8, 2)
    # Window entries are sequence neighbours.
    for i in range(8):
        for j in other[i]:
            assert j != i and abs(int(j) - i) <= 2
    t_v, t_ov = generate_heterogeneous_index_transpose(8)
    hits = 0
    for i in range(8):
        for k in range(2):
            hits += int(other[t_v[i, k], t_ov[i, k]] == i)
    # Most transpose entries are exact inverses (edges may pad).
    assert hits >= 12


def test_epipolar_visualization():
    """The legacy encoder-visualizer analog draws the casting pixel and
    the paired view's epipolar segment into one labeled strip."""
    rng = np.random.default_rng(0)
    h = w = 16
    v = 2
    images = jnp.asarray(rng.uniform(size=(1, v, h, w, 3)), jnp.float32)
    intr = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32)
    intrinsics = jnp.broadcast_to(intr, (1, v, 3, 3))
    extrinsics = jnp.stack(
        [jnp.eye(4), jnp.eye(4).at[0, 3].set(0.3)], axis=0
    ).astype(jnp.float32)[None]
    sampler = EpipolarSampler(num_views=v, num_samples=6)
    out = sampler(
        images, extrinsics, intrinsics,
        jnp.full((1, v), 0.5), jnp.full((1, v), 10.0),
    )

    from freesplat_tpu.utils.epipolar_viz import visualize_epipolar_sampling

    strip = visualize_epipolar_sampling(np.asarray(images[0]), out)
    assert strip.ndim == 3 and strip.shape[-1] == 3
    assert strip.shape[1] > 2 * w  # two labeled panels side by side
    assert np.isfinite(strip).all()
    # The red casting dot exists in the left panel.
    reds = (strip[..., 0] > 0.9) & (strip[..., 1] < 0.2) & (strip[..., 2] < 0.2)
    assert reds.any()


def test_epipolar_sampler_translated_pair():
    """Pure x-translation: epipolar lines are horizontal -> samples keep
    the casting ray's y row, and features come from that row."""
    h = w = 8
    c = 3
    v = 2
    # Feature value encodes the row index.
    img = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None, None], (h, w, c)
    )
    images = jnp.broadcast_to(img, (1, v, h, w, c))
    intr = jnp.array(
        [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32
    )
    intrinsics = jnp.broadcast_to(intr, (1, v, 3, 3))
    extrinsics = jnp.stack(
        [jnp.eye(4), jnp.eye(4).at[0, 3].set(0.3)], axis=0
    ).astype(jnp.float32)[None]
    near = jnp.full((1, v), 0.5)
    far = jnp.full((1, v), 10.0)

    sampler = EpipolarSampler(num_views=v, num_samples=6)
    out = sampler(images, extrinsics, intrinsics, near, far)

    assert out.features.shape == (1, v, 1, h * w, 6, c)
    assert out.valid.shape == (1, v, 1, h * w)
    assert bool(out.valid.any())
    f = np.asarray(out.features)
    assert np.all(np.isfinite(f))

    # For valid rays, sample y ≈ ray y (horizontal epipolar lines).
    xy_ray = np.asarray(out.xy_ray)  # (1, v, r, 2)
    xy_s = np.asarray(out.xy_sample)  # (1, v, 1, r, s, 2)
    valid = np.asarray(out.valid)[0, :, 0]  # (v, r)
    for vi in range(v):
        rows = valid[vi]
        if not rows.any():
            continue
        dy = np.abs(xy_s[0, vi, 0, rows, :, 1] - xy_ray[0, vi, rows, None, 1])
        assert dy.max() < 1e-5

    # Contract: features[b, v, ov, r, s] == the paired view's image
    # bilinearly sampled at xy_sample (zero-padded outside).
    from freesplat_tpu.ops.grid_sample import bilinear_sample

    vi = 0
    rows_idx = np.nonzero(valid[vi])[0]
    mid = rows_idx[len(rows_idx) // 2]
    pix = jnp.asarray(xy_s[0, vi, 0, mid] * np.array([w, h]), jnp.float32)
    direct = np.asarray(bilinear_sample(images[0, 1], pix))
    np.testing.assert_allclose(f[0, vi, 0, mid], direct, atol=1e-5)
