"""End-to-end CLI test: train a few steps on synthetic data, then run the
test harness over synthetic batches (mode=test wiring)."""
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_train_cli_synthetic(tmp_path, capsys):
    from freesplat_tpu.main import main

    main(
        [
            "dataset.name=synthetic",
            "dataset.image_shape=[32,32]",
            "encoder.num_depth_candidates=8",
            "encoder.adapter.sh_degree=1",
            "encoder.train_bn=false",
            "decoder.sh_degree=1",
            "trainer.max_steps=3",
            "trainer.log_every=1",
            f"checkpointing.output_dir={tmp_path}/ckpt",
            "checkpointing.every_n_train_steps=2",
            "optimizer.warm_up_steps=2",
            "optimizer.max_steps=10",
            "optimizer.gradient_clip_val=1.0",
        ]
    )
    out = capsys.readouterr().out
    assert "train step 0" in out
    assert "psnr" in out
    # Checkpoint written at step 2.
    assert (Path(tmp_path) / "ckpt" / "step_2").exists()


def test_test_harness_synthetic(tmp_path):
    from freesplat_tpu.config.config import load_config
    from freesplat_tpu.data.synthetic import SyntheticCfg, synthetic_batches
    from freesplat_tpu.evaluation.harness import run_test

    cfg = load_config(
        [
            "dataset.name=synthetic",
            "dataset.image_shape=[32,32]",
            "encoder.num_depth_candidates=8",
            "encoder.adapter.sh_degree=1",
            "encoder.train_bn=false",
            "decoder.sh_degree=1",
            f"test.output_path={tmp_path}/test_out",
        ]
    )
    batches = synthetic_batches(
        SyntheticCfg(image_shape=(32, 32), num_context=2, num_target=2)
    )
    summary = run_test(cfg, batches=batches, max_scenes=2)
    assert "psnr" in summary and np.isfinite(summary["psnr"])
    assert "depth_abs_diff" in summary
    out_dir = Path(tmp_path) / "test_out"
    stats = json.loads((out_dir / "stats.json").read_text())
    assert len(stats["per_scene"]) == 2
    assert (out_dir / "benchmark.json").exists()
    assert (out_dir / "peak_memory.json").exists()
    # Frame dumps exist.
    scene = stats["per_scene"][0]["scene"]
    assert (out_dir / scene / "color" / "0000.png").exists()
    assert (out_dir / scene / "color" / "0000_gt.png").exists()
    assert (out_dir / scene / "context" / "0000.png").exists()


def test_videoize_index(tmp_path):
    import json

    from freesplat_tpu.scripts.generate_video_evaluation_index import (
        main as video_main,
        videoize_index,
    )

    index = {
        "sceneA": {"context": [3, 9], "target": [5]},
        "sceneB": None,
    }
    out = videoize_index(index)
    assert out["sceneA"]["target"] == list(range(3, 10))
    assert out["sceneA"]["context"] == [3, 9]
    assert out["sceneB"] is None

    src = tmp_path / "in.json"
    dst = tmp_path / "out.json"
    src.write_text(json.dumps(index))
    video_main([str(src), str(dst)])
    assert json.loads(dst.read_text())["sceneA"]["target"][0] == 3
