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


def test_test_harness_view_sharded(tmp_path):
    """test.view_shard=true encodes an 8-view scene with the view axis
    sharded over the 8-device CPU mesh, through the full harness."""
    import numpy as np

    from freesplat_tpu.config.config import load_config
    from freesplat_tpu.data.synthetic import SyntheticCfg, synthetic_batches
    from freesplat_tpu.evaluation.harness import run_test

    cfg = load_config(
        [
            "dataset.name=synthetic",
            "dataset.image_shape=[32,32]",
            "dataset.num_context_views=8",
            "encoder.num_depth_candidates=8",
            "encoder.num_views=3",
            "encoder.d_feature=16",
            "encoder.matching_dim=8",
            "encoder.adapter.sh_degree=1",
            "encoder.train_bn=false",
            "decoder.sh_degree=1",
            "test.view_shard=true",
            "test.save_depth=false",
            f"test.output_path={tmp_path}/out",
        ]
    )
    batches = synthetic_batches(
        SyntheticCfg(image_shape=(32, 32), num_context=8, num_target=2)
    )
    summary = run_test(cfg, batches=batches, max_scenes=1)
    assert np.isfinite(summary["psnr"])
    assert summary["gs_ratio"] < 1.0  # PTF merged the 8 views


def test_test_harness_fvs_split(tmp_path):
    """Replica-style FVS run through the harness: a suffixed test-scene key
    (room0_1 -> dir room0, reference dataset_replica.py:70-90) with frozen
    eval-index extrapolation targets must produce interpolation_/
    extrapolation_ metric blocks and split frame dumps
    (model_wrapper.py:427-443)."""
    import numpy as np
    from PIL import Image

    from freesplat_tpu.config.config import load_config
    from freesplat_tpu.data.scannet import (
        DatasetScannet,
        DatasetScannetCfg,
        data_loader,
    )
    from freesplat_tpu.data.view_samplers import (
        ViewSamplerEvaluation,
        ViewSamplerEvaluationCfg,
    )
    from freesplat_tpu.evaluation.harness import run_test

    rng = np.random.default_rng(0)
    scene = tmp_path / "test" / "room0"
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
    extr[:, 0, 3] = np.linspace(0, 1.5, n)
    np.save(scene / "extrinsics.npy", extr)
    (tmp_path / "test_idx.txt").write_text("room0_1\n")

    index = {
        "room0_1": {
            "context": [0, 8],
            "target": [3, 5],
            "extrapolation": [20, 25],
        }
    }
    index_path = tmp_path / "evaluation_index_replica_2views.json"
    index_path.write_text(json.dumps(index))

    ds = DatasetScannet(
        DatasetScannetCfg(
            roots=(str(tmp_path),), image_shape=(32, 64), load_size=(48, 64)
        ),
        "test",
        ViewSamplerEvaluation(ViewSamplerEvaluationCfg(str(index_path))),
    )
    batches = data_loader(ds, batch_size=1, shuffle=False)

    cfg = load_config(
        [
            "dataset.name=replica",
            "dataset.image_shape=[32,64]",
            "encoder.num_depth_candidates=8",
            "encoder.adapter.sh_degree=1",
            "encoder.train_bn=false",
            "decoder.sh_degree=1",
            f"test.output_path={tmp_path}/test_out",
        ]
    )
    summary = run_test(cfg, batches=batches, max_scenes=1)
    assert np.isfinite(summary["interpolation_psnr"])
    assert np.isfinite(summary["extrapolation_psnr"])
    assert "psnr" not in summary  # FVS scenes report only the split blocks

    out_dir = Path(tmp_path) / "test_out"
    stats = json.loads((out_dir / "stats.json").read_text())
    entry = stats["per_scene"][0]
    assert entry["scene"] == "room0_1"
    assert entry["num_views"] == 4  # 2 interpolation + 2 extrapolation
    # Extrapolation frames are the LAST fvs_length targets.
    assert (out_dir / "room0_1" / "interpolation" / "0000.png").exists()
    assert (out_dir / "room0_1" / "interpolation" / "0001.png").exists()
    assert (out_dir / "room0_1" / "extrapolation" / "0002.png").exists()
    assert (out_dir / "room0_1" / "extrapolation" / "0003.png").exists()


def test_overfit_proof_pipeline(tmp_path):
    """The quality-proof script end to end at smoke scale: train through
    the CLI, checkpoint, evaluate the checkpoint through the harness,
    and print the stats summary."""
    from freesplat_tpu.scripts.overfit_proof import main as proof

    proof(
        [
            "--steps", "6",
            "--out", str(tmp_path / "proof"),
            "--image-shape", "32,64",
            "--val-every", "5",
        ]
    )
    stats = json.loads(
        (tmp_path / "proof" / "test" / "stats.json").read_text()
    )
    assert len(stats["per_scene"]) == 1
    assert np.isfinite(stats["summary"]["psnr"])
    assert (tmp_path / "proof" / "ckpt" / "step_5").exists()


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


def _write_scannet_scene(root, n=30, h=48, w=64):
    from PIL import Image

    rng = np.random.default_rng(0)
    scene = root / "train" / "scene0000_00"
    (scene / "color").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "intrinsic").mkdir()
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
        ).save(scene / "color" / f"{i}.jpg")
        Image.fromarray(
            rng.integers(500, 5000, (h, w), dtype=np.int32), "I"
        ).save(scene / "depth" / f"{i}.png")
    k = np.array(
        [[80.0, 0, w / 2, 0], [0, 80, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    )
    np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", k)
    extr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    extr[:, 0, 3] = np.linspace(0, 1, n)
    np.save(scene / "extrinsics.npy", extr)
    (root / "train_idx.txt").write_text("scene0000_00\n")
    (root / "test_idx.txt").write_text("scene0000_00\n")


def test_train_curriculum_step_advances_per_iteration(tmp_path, monkeypatch):
    """The bounded sampler must see the TRUE host step at every batch
    draw, not the log_fn-lagged one (reference semantics: shared-memory
    StepTracker, src/misc/step_tracker.py + view_sampler_bounded.py:29-61).
    log_every is set far above max_steps so any step the sampler sees
    beyond 0 can only come from per-iteration propagation."""
    from freesplat_tpu.data.view_samplers import ViewSamplerBounded
    from freesplat_tpu.main import main

    _write_scannet_scene(tmp_path / "data")
    seen = []
    orig = ViewSamplerBounded.set_step

    def spy(self, step):
        seen.append(int(step))
        return orig(self, step)

    monkeypatch.setattr(ViewSamplerBounded, "set_step", spy)
    main(
        [
            "dataset.name=scannet",
            f"dataset.roots=[{tmp_path}/data]",
            "dataset.image_shape=[32,64]",
            "encoder.num_depth_candidates=8",
            "encoder.adapter.sh_degree=1",
            "encoder.train_bn=false",
            "decoder.sh_degree=1",
            "trainer.max_steps=5",
            "trainer.log_every=1000",
            "trainer.val_check_interval=1000000",
            f"checkpointing.output_dir={tmp_path}/ckpt",
            "checkpointing.every_n_train_steps=1000000",
            "optimizer.warm_up_steps=2",
            "optimizer.max_steps=10",
            "optimizer.gradient_clip_val=1.0",
        ]
    )
    # Draws are monotone in step and reach past the first iterations;
    # the pre-fix behavior records only zeros (log_fn never fires).
    assert seen == sorted(seen)
    assert max(seen) >= 3, seen


@pytest.mark.parametrize("num_context", [6, 10])
def test_chunked_whole_scene_encode_matches_monolithic(num_context):
    """make_chunked_encode (host-looped trunk chunks + global nearest-k
    geometry + one fuse) must reproduce the monolithic encoder.apply
    exactly — it is the single-chip whole-scene path (one 30-view
    384x512 encode graph plans ~23 GB; chunks bound the peak).

    num_context=10 additionally exercises the growing-bucket PTF branch
    (v > 8 routes phase C1 through fuse_views_bucketed)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from freesplat_tpu.data.synthetic import SyntheticCfg, synthetic_batches
    from freesplat_tpu.evaluation.harness import make_chunked_encode
    from freesplat_tpu.models.encoder import (
        EncoderFreeSplat,
        EncoderFreeSplatCfg,
    )
    from freesplat_tpu.models.adapter import GaussianAdapterCfg

    batch = next(
        synthetic_batches(
            SyntheticCfg(
                image_shape=(32, 64), num_context=num_context, num_target=1
            )
        )
    )
    context = {
        k: jnp.asarray(v)
        for k, v in batch["context"].items()
        if k in ("image", "intrinsics", "extrinsics", "near", "far")
    }
    cfg = EncoderFreeSplatCfg(
        num_depth_candidates=8,
        num_views=3,  # nearest-k path (v=6 > num_views)
        adapter=GaussianAdapterCfg(0.5, 15.0, 1),
        train_bn=False,
    )
    enc = EncoderFreeSplat(cfg)
    variables = enc.init(jax.random.PRNGKey(0), context)

    mono = enc.apply(variables, context)
    chunked = make_chunked_encode(enc, variables, view_chunk=2)(context)

    g1, g2 = mono["gaussians"], chunked["gaussians"]
    assert int(np.sum(np.asarray(g1.mask))) == int(
        np.sum(np.asarray(g2.mask))
    )
    for name in ("means", "covariances", "harmonics", "opacities"):
        a = np.asarray(getattr(g1, name))[np.asarray(g1.mask)]
        b = np.asarray(getattr(g2, name))[np.asarray(g2.mask)]
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(mono["depth_s-1"]), np.asarray(chunked["depth_s-1"]),
        atol=1e-5,
    )


def test_render_capacity_factor_override(tmp_path):
    """test.render_capacity_factor overrides the decoder's static
    instance budget at TEST time only (whole-scene fused sets need a
    fraction of the 3.0 training default; drops stay reported)."""
    import numpy as np

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
            "test.render_capacity_factor=1.0",
            f"test.output_path={tmp_path}/test_out",
        ]
    )
    assert cfg.test.render_capacity_factor == 1.0
    assert cfg.decoder.capacity_factor == 3.0  # training default untouched
    batches = synthetic_batches(
        SyntheticCfg(image_shape=(32, 32), num_context=2, num_target=2)
    )
    summary = run_test(cfg, batches=batches, max_scenes=1)
    assert np.isfinite(summary["psnr"])
    # 32x32 smoke scenes fit far under even a 1.0 budget (32k floor)
    assert summary["dropped_instances"] == 0
