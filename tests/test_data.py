"""Tests for the data layer: shims, view samplers, synthetic scenes,
and the ScanNet loader against an on-disk fixture in the reference layout."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from freesplat_tpu.data.shims import (
    apply_augmentation_shim,
    apply_crop_shim,
    rescale_and_crop,
)
from freesplat_tpu.data.synthetic import SyntheticCfg, synthetic_batches
from freesplat_tpu.data.view_samplers import (
    ViewSamplerAll,
    ViewSamplerArbitrary,
    ViewSamplerArbitraryCfg,
    ViewSamplerBounded,
    ViewSamplerBoundedCfg,
    ViewSamplerEvaluation,
    ViewSamplerEvaluationCfg,
)


def make_views(v=2, h=48, w=64, with_depth=True, seed=0):
    rng = np.random.default_rng(seed)
    intr = np.tile(
        np.array([[1.2, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], np.float32),
        (v, 1, 1),
    )
    views = {
        "extrinsics": np.tile(np.eye(4, dtype=np.float32), (v, 1, 1)),
        "intrinsics": intr,
        "image": rng.uniform(size=(v, h, w, 3)).astype(np.float32),
        "near": np.full(v, 0.5, np.float32),
        "far": np.full(v, 15.0, np.float32),
        "index": np.arange(v),
    }
    if with_depth:
        views["depth"] = rng.uniform(0.5, 5.0, size=(v, h, w)).astype(np.float32)
    return views


def test_rescale_and_crop_shapes_and_intrinsics():
    views = make_views()
    img, intr = rescale_and_crop(views["image"], views["intrinsics"], (32, 32))
    assert img.shape == (2, 32, 32, 3)
    # Cropping 64->32 wide at same height scale: fx normalized grows by 1.5
    # (48->32 scale factor then crop 96->... check finite & principal ~0.5).
    assert np.isfinite(intr).all()
    assert abs(intr[0, 0, 2] - 0.5) < 0.05


def test_crop_shim_depth_pyramid():
    example = {
        "context": make_views(),
        "target": make_views(seed=1),
        "scene": "x",
    }
    out = apply_crop_shim(example, (32, 32))
    ctx = out["context"]
    assert ctx["image"].shape == (2, 32, 32, 3)
    assert ctx["depth"].shape == (2, 32, 32)
    assert ctx["depth_s-1"].shape == (2, 32, 32)
    for s in range(4):
        assert ctx[f"depth_s{s}"].shape == (2, 32 // 2 ** (s + 1), 32 // 2 ** (s + 1))


def test_augmentation_flip_roundtrip():
    example = {"context": make_views(), "target": make_views(seed=1)}
    rng = np.random.default_rng(5)
    # Force the flip branch by trying until it triggers.
    flipped = None
    for _ in range(20):
        out = apply_augmentation_shim(example, rng)
        if not np.allclose(out["context"]["image"], example["context"]["image"]):
            flipped = out
            break
    assert flipped is not None
    np.testing.assert_allclose(
        flipped["context"]["image"][:, :, ::-1], example["context"]["image"]
    )
    # Extrinsics stay valid rigid transforms.
    r = flipped["context"]["extrinsics"][0, :3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_bounded_sampler_curriculum():
    cfg = ViewSamplerBoundedCfg(
        num_context_views=2,
        min_distance_between_context_views=20,
        max_distance_between_context_views=40,
        initial_min_distance_between_context_views=10,
        initial_max_distance_between_context_views=12,
        min_distance_to_context_views=2,
        warm_up_steps=100,
    )
    s = ViewSamplerBounded(cfg, stage="train", seed=0)
    extr = np.tile(np.eye(4, dtype=np.float32), (100, 1, 1))
    intr = np.tile(np.eye(3, dtype=np.float32), (100, 1, 1))

    s.set_step(0)
    gaps_early = []
    for _ in range(20):
        ctx, tgt, _ = s.sample("sc", extr, intr)
        gaps_early.append(ctx[1] - ctx[0])
        assert len(ctx) == 2
        assert all(ctx[0] < t < ctx[1] for t in tgt)
    assert max(gaps_early) <= 12

    s.set_step(100)
    gaps_late = []
    for _ in range(20):
        ctx, _, _ = s.sample("sc", extr, intr)
        gaps_late.append(ctx[1] - ctx[0])
    assert max(gaps_late) > 12
    assert min(gaps_late) >= 20


def test_bounded_sampler_random_contexts_fvt():
    cfg = ViewSamplerBoundedCfg(
        num_context_views=6, random=True, warm_up_steps=0,
        min_distance_between_context_views=10,
        max_distance_between_context_views=12,
        min_distance_to_context_views=2,
    )
    s = ViewSamplerBounded(cfg, stage="train", seed=1)
    extr = np.tile(np.eye(4, dtype=np.float32), (200, 1, 1))
    counts = set()
    for _ in range(30):
        ctx, _, _ = s.sample("sc", extr, extr[:, :3, :3])
        counts.add(len(ctx))
    assert len(counts) > 1  # varies between 2..6
    assert min(counts) >= 2 and max(counts) <= 6


def test_evaluation_sampler(tmp_path):
    index = {
        "scene_a": {"context": [0, 10], "target": [3, 5]},
        "scene_b": {
            "context": [0, 10],
            "target": [3],
            "extrapolation": [20, 25],
        },
        "scene_null": None,
    }
    path = tmp_path / "idx.json"
    path.write_text(json.dumps(index))
    s = ViewSamplerEvaluation(ViewSamplerEvaluationCfg(index_path=str(path)))
    ctx, tgt, fvs = s.sample("scene_a", None, None)
    assert list(ctx) == [0, 10] and list(tgt) == [3, 5] and fvs == 0
    ctx, tgt, fvs = s.sample("scene_b", None, None)
    assert fvs == 2
    # Extrapolation appended last (reference view_sampler_evaluation.py:66).
    assert list(tgt) == [3, 20, 25]
    assert "scene_null" not in s.index


def test_arbitrary_and_all_samplers():
    extr = np.tile(np.eye(4, dtype=np.float32), (7, 1, 1))
    arb = ViewSamplerArbitrary(ViewSamplerArbitraryCfg((1, 3), (5,)))
    ctx, tgt, _ = arb.sample("s", extr, None)
    assert list(ctx) == [1, 3] and list(tgt) == [5]
    al = ViewSamplerAll()
    ctx, tgt, _ = al.sample("s", extr, None)
    assert list(ctx) == list(range(7))


def test_synthetic_batches_contract():
    cfg = SyntheticCfg(num_gaussians=300, image_shape=(24, 32), num_context=2,
                       num_target=1)
    batch = next(synthetic_batches(cfg))
    ctx = batch["context"]
    assert ctx["image"].shape == (1, 2, 24, 32, 3)
    assert ctx["extrinsics"].shape == (1, 2, 4, 4)
    assert ctx["depth"].shape == (1, 2, 24, 32)
    assert float(ctx["image"].max()) <= 1.0
    assert batch["target"]["image"].shape == (1, 1, 24, 32, 3)
    # Context images differ between views (parallax).
    assert not np.allclose(
        np.asarray(ctx["image"][0, 0]), np.asarray(ctx["image"][0, 1])
    )


def test_scannet_loader_fixture(tmp_path):
    """Build a scene directory in the reference layout and load it."""
    rng = np.random.default_rng(0)
    scene = tmp_path / "train" / "scene0000_00"
    (scene / "color").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "intrinsic").mkdir()
    n = 30
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8), "RGB"
        ).save(scene / "color" / f"{i}.jpg")
        Image.fromarray(
            rng.integers(500, 5000, (48, 64), dtype=np.int32), "I"
        ).save(scene / "depth" / f"{i}.png")
    k = np.array([[80.0, 0, 32, 0], [0, 80, 24, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", k)
    extr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    extr[:, 0, 3] = np.linspace(0, 1, n)
    np.save(scene / "extrinsics.npy", extr)
    (tmp_path / "train_idx.txt").write_text("scene0000_00\n")

    from freesplat_tpu.data.scannet import (
        DatasetScannet,
        DatasetScannetCfg,
        collate,
        data_loader,
    )

    cfg = DatasetScannetCfg(
        roots=(str(tmp_path),), image_shape=(32, 48), load_size=(48, 64)
    )
    sampler = ViewSamplerBounded(
        ViewSamplerBoundedCfg(
            num_context_views=2,
            min_distance_between_context_views=6,
            max_distance_between_context_views=10,
            initial_min_distance_between_context_views=6,
            initial_max_distance_between_context_views=10,
            min_distance_to_context_views=2,
            warm_up_steps=0,
        ),
        seed=0,
    )
    ds = DatasetScannet(cfg, "train", sampler)
    assert len(ds) == 1
    ex = ds[0]
    assert ex["scene"] == "scene0000_00"
    assert ex["context"]["image"].shape[1:] == (32, 48, 3)
    assert ex["context"]["depth"].shape[1:] == (32, 48)
    assert ex["context"]["depth_s0"].shape[1:] == (16, 24)
    # Depth in meters after /1000.
    assert 0.4 < ex["context"]["depth"].mean() < 6.0

    batch = next(data_loader(ds, batch_size=1, step_fn=lambda: 0))
    assert batch["context"]["image"].shape[0] == 1
    assert batch["scene"] == ["scene0000_00"]


class _FakeDataset:
    """Map-style dataset of trivially collatable examples."""

    def __init__(self, n=5):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "context": {"image": np.full((2, 4, 4, 3), float(i), np.float32)},
            "target": {"image": np.full((1, 4, 4, 3), float(i), np.float32)},
            "scene": f"s{i}",
        }


def test_data_module_stages_and_shim():
    from freesplat_tpu.data.data_module import (
        DataLoaderStageCfg,
        DataModule,
        Prefetcher,
        ValidationWrapper,
    )

    calls = []

    def shim(batch):
        calls.append(1)
        batch["shimmed"] = True
        return batch

    dm = DataModule(
        lambda stage: _FakeDataset(5),
        DataLoaderStageCfg(batch_size=1, seed=0),
        shim=shim,
        prefetch=0,
    )

    # Test stage: sequential, non-looping, shimmed.
    test_scenes = [b["scene"][0] for b in dm.test_batches()]
    assert test_scenes == [f"s{i}" for i in range(5)]
    assert len(calls) == 5

    # Train stage: loops forever, shuffled.
    it = dm.train_batches()
    seen = [next(it)["scene"][0] for _ in range(12)]
    assert len(seen) == 12 and set(seen) <= {f"s{i}" for i in range(5)}

    # Val stage: one random example per pass (ValidationWrapper semantics).
    vw = ValidationWrapper(_FakeDataset(50), seed=3)
    assert len(vw) == 1
    vit = iter(vw)
    draws = {next(vit)["scene"] for _ in range(20)}
    assert len(draws) > 1  # fresh random draw each pass

    vb = dm.val_batches()
    batch = next(vb)
    assert batch["shimmed"] and batch["context"]["image"].shape[0] == 1

    # Prefetcher preserves order and terminates.
    pf = Prefetcher(iter(range(7)), depth=2)
    assert list(pf) == list(range(7))
    pf2 = Prefetcher(iter(range(1000)), depth=2)
    assert next(pf2) == 0
    pf2.close()


def test_data_module_multihost_partition(monkeypatch):
    """Each process must stream a DISJOINT partition of the data — N
    hosts streaming identical batches would silently train on duplicated
    data at N-host cost."""
    from freesplat_tpu.data.data_module import DataLoaderStageCfg, DataModule

    def scenes_for(rank):
        dm = DataModule(
            lambda stage: _FakeDataset(8),
            DataLoaderStageCfg(batch_size=1, seed=0),
            prefetch=0,
        )
        monkeypatch.setattr(
            type(dm), "_process_rank", staticmethod(lambda: (rank, 2))
        )
        return [b["scene"][0] for b in dm.test_batches()]

    a, b = scenes_for(0), scenes_for(1)
    assert len(a) == len(b) == 4
    assert not (set(a) & set(b))  # disjoint
    assert set(a) | set(b) == {f"s{i}" for i in range(8)}  # complete


def test_data_module_step_fn_reaches_sampler():
    from freesplat_tpu.data.data_module import DataLoaderStageCfg, DataModule

    class _SamplerSpy:
        def __init__(self):
            self.steps = []

        def set_step(self, s):
            self.steps.append(s)

    class _DS(_FakeDataset):
        def __init__(self):
            super().__init__(3)
            self.view_sampler = _SamplerSpy()

    ds = _DS()
    dm = DataModule(
        lambda stage: ds,
        DataLoaderStageCfg(batch_size=1, seed=0),
        step_fn=lambda: 42,
        prefetch=0,
    )
    it = dm.train_batches()
    next(it)
    assert ds.view_sampler.steps == [42]


def test_replica_loader_fvs_fixture(tmp_path):
    """Replica-layout fixture end-to-end through the FVS target path
    (VERDICT r3 item 6; reference dataset_replica.py:60-170): the eval
    index keys scenes as `<scene>_N`, the on-disk dir is the stripped
    name, `intrinsic_depth.txt` supplies depth intrinsics normalized by
    the DEPTH image size, and the FVS extrapolation targets land LAST
    with test_fvs set."""
    rng = np.random.default_rng(3)
    scene = tmp_path / "test" / "office0"
    (scene / "color").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "intrinsic").mkdir()
    n = 12
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8), "RGB"
        ).save(scene / "color" / f"{i}.jpg")
        # Depth camera at a DIFFERENT native resolution than color.
        Image.fromarray(
            rng.integers(500, 5000, (24, 32), dtype=np.int32), "I"
        ).save(scene / "depth" / f"{i}.png")
    k = np.array([[80.0, 0, 32, 0], [0, 80, 24, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", k)
    dk = np.array([[40.0, 0, 16, 0], [0, 40, 12, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    np.savetxt(scene / "intrinsic" / "intrinsic_depth.txt", dk)
    extr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    extr[:, 0, 3] = np.linspace(0, 1, n)
    np.save(scene / "extrinsics.npy", extr)
    # The test index lists the SUFFIXED key; only the stripped dir exists.
    (tmp_path / "test_idx.txt").write_text("office0_1\n")
    index = {
        "office0_1": {
            "context": [0, 6],
            "target": [2, 4],
            "extrapolation": [9, 11],
        }
    }
    index_path = tmp_path / "evaluation_index_replica.json"
    index_path.write_text(json.dumps(index))

    from freesplat_tpu.data.replica import DatasetReplica
    from freesplat_tpu.data.scannet import DatasetScannetCfg, collate
    from freesplat_tpu.data.view_samplers import (
        ViewSamplerEvaluation,
        ViewSamplerEvaluationCfg,
    )

    cfg = DatasetScannetCfg(
        roots=(str(tmp_path),), image_shape=(32, 48), load_size=(48, 64)
    )
    sampler = ViewSamplerEvaluation(
        ViewSamplerEvaluationCfg(index_path=str(index_path))
    )
    ds = DatasetReplica(cfg, "test", sampler)
    assert len(ds) == 1
    ex = ds[0]
    # Scene key keeps the suffix (it indexes the frozen eval protocol).
    assert ex["scene"] == "office0_1"
    # FVS: extrapolation targets appended last, test_fvs = their count.
    assert ex["target"]["test_fvs"] == 2
    np.testing.assert_array_equal(
        ex["target"]["index"], np.asarray([2, 4, 9, 11])
    )
    # Target poses == plain indexing (the reference's cat([...]) of a
    # reload of the same extrinsics file is equivalent — see
    # data/replica.py docstring).
    np.testing.assert_allclose(
        ex["target"]["extrinsics"], extr[[2, 4, 9, 11]], atol=1e-6
    )
    # Depth intrinsics: from intrinsic_depth.txt, normalized by the
    # depth image's 32x24 native size, per-view rows on both parts.
    for part, count in (("context", 2), ("target", 4)):
        dkn = ex[part]["depth_intrinsics"]
        assert dkn.shape == (count, 3, 3)
        np.testing.assert_allclose(dkn[0, 0, 0], 40.0 / 32.0, rtol=1e-6)
        np.testing.assert_allclose(dkn[0, 1, 1], 40.0 / 24.0, rtol=1e-6)
        np.testing.assert_allclose(dkn[0, 0, 2], 16.0 / 32.0, rtol=1e-6)
    # Color intrinsics normalized by the color image size as usual
    # (the crop shim then nudges cx by the center-crop offset).
    np.testing.assert_allclose(
        ex["context"]["intrinsics"][0, 0, 2], 0.5, atol=0.02
    )
    # Collates (the depth_intrinsics rows stack like any other field).
    batch = collate([ex])
    assert batch["context"]["depth_intrinsics"].shape == (1, 2, 3, 3)
    assert batch["target"]["test_fvs"] == 2
