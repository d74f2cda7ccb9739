"""RE10K chunk-loader test against a synthetic .torch fixture."""
import io

import numpy as np
import pytest
from PIL import Image

from freesplat_tpu.data.re10k import DatasetRE10k, DatasetRE10kCfg, convert_poses
from freesplat_tpu.data.view_samplers import (
    ViewSamplerBounded,
    ViewSamplerBoundedCfg,
)

torch = pytest.importorskip("torch")


def pack_pose(fx, fy, cx, cy, w2c):
    return np.concatenate(
        [[fx, fy, cx, cy, 0.0, 0.0], np.asarray(w2c[:3]).reshape(-1)]
    ).astype(np.float32)


def test_convert_poses_roundtrip():
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation as R

    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R.random(random_state=rng).as_matrix()
    w2c[:3, 3] = rng.normal(size=3)
    row = pack_pose(0.9, 1.1, 0.5, 0.5, w2c)[None]
    extr, intr = convert_poses(row)
    np.testing.assert_allclose(extr[0], np.linalg.inv(w2c), atol=1e-5)
    assert intr[0, 0, 0] == pytest.approx(0.9)
    assert intr[0, 1, 1] == pytest.approx(1.1)


def make_chunk(tmp_path, n_frames=30, fx=0.9, shape=(36, 64)):
    rng = np.random.default_rng(1)
    cameras = []
    for i in range(n_frames):
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = -0.1 * i
        cameras.append(pack_pose(fx, fx, 0.5, 0.5, w2c))
    images = []
    for _ in range(n_frames):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (*shape, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        images.append(
            torch.frombuffer(bytearray(buf.getvalue()), dtype=torch.uint8)
        )
    scene = {
        "key": "scene_re10k",
        "cameras": torch.tensor(np.stack(cameras)),
        "images": images,
    }
    out = tmp_path / "train"
    out.mkdir(parents=True, exist_ok=True)
    torch.save([scene], out / "000000.torch")


def make_sampler():
    return ViewSamplerBounded(
        ViewSamplerBoundedCfg(
            num_context_views=2,
            min_distance_between_context_views=6,
            max_distance_between_context_views=10,
            min_distance_to_context_views=2,
            warm_up_steps=0,
        ),
        seed=0,
    )


def test_re10k_loader(tmp_path):
    make_chunk(tmp_path)
    cfg = DatasetRE10kCfg(
        roots=(str(tmp_path),), image_shape=(32, 32), expected_shape=(36, 64)
    )
    ds = DatasetRE10k(cfg, "train", make_sampler())
    example = next(ds.examples())
    assert example["scene"] == "scene_re10k"
    assert example["context"]["image"].shape[1:] == (32, 32, 3)
    assert example["context"]["extrinsics"].shape == (2, 4, 4)
    # Intrinsics renormalized after the crop shim; principal stays centered.
    np.testing.assert_allclose(
        example["context"]["intrinsics"][0, 0, 2], 0.5, atol=0.05
    )


def test_re10k_skips_wide_fov(tmp_path):
    make_chunk(tmp_path, fx=0.3)  # fov_x ≈ 118° > 100°
    cfg = DatasetRE10kCfg(
        roots=(str(tmp_path),), image_shape=(32, 32), expected_shape=(36, 64)
    )
    ds = DatasetRE10k(cfg, "train", make_sampler())
    assert list(ds.examples()) == []


def test_re10k_skips_wrong_shape(tmp_path):
    make_chunk(tmp_path, shape=(40, 40))
    cfg = DatasetRE10kCfg(
        roots=(str(tmp_path),), image_shape=(32, 32), expected_shape=(36, 64)
    )
    ds = DatasetRE10k(cfg, "train", make_sampler())
    assert list(ds.examples()) == []
