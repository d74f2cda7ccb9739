"""Tests for the config system, ply export, and benchmarker."""
import json

import numpy as np
import pytest

from freesplat_tpu.config.config import (
    EXPERIMENTS,
    RootCfg,
    apply_override,
    load_config,
)
from freesplat_tpu.utils.benchmarker import Benchmarker
from freesplat_tpu.utils.ply_export import export_ply, load_ply


def test_experiment_presets():
    cfg = EXPERIMENTS["scannet/2views"]()
    assert cfg.encoder.num_views == 2
    assert cfg.encoder.num_depth_candidates == 128
    assert cfg.dataset.image_shape == (384, 512)
    assert cfg.optimizer.gradient_clip_val == 0.01

    cfg3 = EXPERIMENTS["scannet/3views"]()
    assert cfg3.encoder.num_views == 3

    fvt = EXPERIMENTS["scannet/fvt"]()
    assert fvt.dataset.fvt_random_contexts

    re10k = EXPERIMENTS["re10k/2views"]()
    assert re10k.dataset.image_shape == (256, 256)
    assert not re10k.encoder.log_planes  # inverse-linear planes for RE10K
    assert re10k.optimizer.gradient_clip_val == 0.05

    replica = EXPERIMENTS["replica/3views"]()
    assert replica.mode == "test"


def test_dotted_overrides():
    cfg = RootCfg()
    cfg = apply_override(cfg, "optimizer.lr", "3e-4")
    assert cfg.optimizer.lr == pytest.approx(3e-4)
    cfg = apply_override(cfg, "dataset.image_shape", "[64,96]")
    assert cfg.dataset.image_shape == (64, 96)
    cfg = apply_override(cfg, "mode", "test")
    assert cfg.mode == "test"
    cfg = apply_override(cfg, "checkpointing.load", "somewhere")
    assert cfg.checkpointing.load == "somewhere"
    # Optional[int] fields defaulting to None coerce from the annotation.
    cfg = apply_override(cfg, "test.max_scenes", "3")
    assert cfg.test.max_scenes == 3
    cfg = apply_override(cfg, "test.max_scenes", "none")
    assert cfg.test.max_scenes is None
    # Optional[str] stays a string.
    cfg = apply_override(cfg, "dataset.overfit_to_scene", "scene0000_00")
    assert cfg.dataset.overfit_to_scene == "scene0000_00"
    with pytest.raises(KeyError):
        apply_override(cfg, "nonexistent.field", "1")


def test_load_config_cli():
    cfg = load_config(
        ["+experiment=scannet/3views", "mode=test", "trainer.max_steps=10"]
    )
    assert cfg.encoder.num_views == 3
    assert cfg.mode == "test"
    assert cfg.trainer.max_steps == 10


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    g = 100
    means = rng.normal(size=(g, 3)).astype(np.float32)
    scales = rng.uniform(0.01, 0.5, size=(g, 3)).astype(np.float32)
    rots = rng.normal(size=(g, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=-1, keepdims=True)
    harm = rng.normal(size=(g, 3, 4)).astype(np.float32)
    opac = rng.uniform(0.05, 0.95, size=g).astype(np.float32)
    mask = rng.uniform(size=g) > 0.3

    path = tmp_path / "out.ply"
    export_ply(means, scales, rots, harm, opac, path, mask=mask)
    data = load_ply(path)
    n = int(mask.sum())
    assert len(data["x"]) == n
    # Opacity stored as logit.
    np.testing.assert_allclose(
        1 / (1 + np.exp(-data["opacity"])), opac[mask], atol=1e-5
    )
    # Scales stored as log.
    np.testing.assert_allclose(np.exp(data["scale_0"]), scales[mask, 0], rtol=1e-5)
    # DC-only SH preserved.
    np.testing.assert_allclose(data["f_dc_0"], harm[mask, 0, 0], atol=1e-6)


def test_benchmarker(tmp_path):
    b = Benchmarker()
    with b.time("encoder"):
        pass
    with b.time("decoder", num_calls=4):
        pass
    b.store("psnr", 30.0)
    assert len(b.execution_times["decoder"]) == 4
    b.dump(tmp_path / "benchmark.json")
    b.dump_metrics(tmp_path / "metrics.json")
    b.dump_memory(tmp_path / "mem.json")
    loaded = json.loads((tmp_path / "benchmark.json").read_text())
    assert "encoder" in loaded
    s = b.summarize()
    assert "encoder" in s and s["encoder"] >= 0
