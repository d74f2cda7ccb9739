"""Native C++ loader vs the PIL reference paths."""
import numpy as np
import pytest
from PIL import Image

from freesplat_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader unavailable"
)


def test_jpeg_batch_matches_pil(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        a = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(a, "RGB").save(p, quality=95)
        paths.append(str(p))
    out = native.load_jpeg_batch(paths, 24, 32)
    ref = np.stack(
        [
            np.asarray(
                Image.open(p).resize((32, 24), Image.LANCZOS)
            ).astype(np.float32)
            / 255.0
            for p in paths
        ]
    )
    # PIL rounds/clips to uint8 between the two resample passes; the
    # native loader keeps double precision end to end — on random
    # high-frequency texture the worst pixel differs by a few 8-bit
    # quantization steps (measured ~4.4/255 here).
    assert out.shape == (3, 24, 32, 3)
    assert float(np.abs(out - ref).max()) < 6.0 / 255.0
    assert float(np.abs(out - ref).mean()) < 0.5 / 255.0


def test_depth_batch_matches_pil(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(4):
        a = rng.integers(400, 6000, (48, 64)).astype(np.int32)
        p = tmp_path / f"{i}.png"
        Image.fromarray(a, "I").save(p)
        paths.append(str(p))
    out = native.load_depth_batch(paths, 24, 32)
    ref = np.stack(
        [
            np.asarray(Image.open(p).resize((32, 24))).astype(np.float32)
            for p in paths
        ]
    )
    assert out.shape == (4, 24, 32)
    # Raw units (mm); PIL rounds between passes, native keeps float.
    assert float(np.abs(out - ref).max()) <= 1.5


def test_depth_batch_fallback_on_bad_file(tmp_path):
    p = tmp_path / "junk.png"
    p.write_bytes(b"not a png")
    with pytest.raises(RuntimeError):
        native.load_depth_batch([str(p)], 8, 8)
