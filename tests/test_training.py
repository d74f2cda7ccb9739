"""Tests for metrics, losses, schedule, and checkpointing."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesplat_tpu.training.losses import (
    LossCfg,
    LossLpipsCfg,
    LossMseCfg,
    lpips_loss,
    total_loss,
)
from freesplat_tpu.training.lpips import LPIPS
from freesplat_tpu.training.metrics import (
    compute_psnr,
    compute_ssim,
    depth_metrics,
)
from freesplat_tpu.training.schedule import OptimizerCfg, make_schedule


def test_psnr_known_value():
    gt = jnp.zeros((1, 8, 8, 3))
    pred = jnp.full((1, 8, 8, 3), 0.1)
    # MSE = 0.01 -> PSNR = 20 dB
    np.testing.assert_allclose(np.asarray(compute_psnr(gt, pred)), [20.0], atol=1e-4)


def test_psnr_clips_input():
    gt = jnp.ones((1, 4, 4, 3))
    pred = jnp.full((1, 4, 4, 3), 2.0)  # clipped to 1 -> identical
    assert float(compute_psnr(gt, pred)[0]) > 99


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)), dtype=jnp.float32)
    ssim_same = compute_ssim(img, img)
    np.testing.assert_allclose(np.asarray(ssim_same), 1.0, atol=1e-5)
    noisy = jnp.clip(img + 0.2 * rng.normal(size=img.shape).astype(np.float32), 0, 1)
    ssim_noisy = compute_ssim(img, noisy)
    assert np.all(np.asarray(ssim_noisy) < 0.9)
    blurrier = jnp.clip(img + 0.05 * rng.normal(size=img.shape).astype(np.float32), 0, 1)
    assert np.all(np.asarray(compute_ssim(img, blurrier)) > np.asarray(ssim_noisy))


def test_depth_metrics_perfect_and_masked():
    gt = jnp.full((1, 8, 8), 2.0)
    m = depth_metrics(gt, gt)
    assert float(m["abs_diff"]) == 0.0
    assert float(m["delta_25"]) == 1.0
    # Invalid gt (<= 0.5) is ignored.
    gt2 = gt.at[0, 0, 0].set(0.0)
    pred = gt.at[0, 0, 0].set(100.0)
    m2 = depth_metrics(gt2, pred)
    assert float(m2["abs_diff"]) == 0.0


def test_total_loss_mse_only():
    pred = jnp.zeros((1, 1, 8, 8, 3))
    target = jnp.full_like(pred, 0.5)
    loss, parts = total_loss(
        LossCfg(mse=LossMseCfg(weight=2.0), lpips=None), pred, target,
        jnp.asarray(0),
    )
    np.testing.assert_allclose(float(loss), 2.0 * 0.25, atol=1e-6)
    assert "mse" in parts and "lpips" not in parts


def test_lpips_module_basic():
    rng = jax.random.PRNGKey(0)
    module = LPIPS()
    img = jax.random.uniform(rng, (2, 32, 32, 3))
    params = module.init(rng, img, img)
    d_same = module.apply(params, img, img)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    other = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    d_diff = module.apply(params, img, other)
    assert d_diff.shape == (2,)
    assert np.all(np.isfinite(np.asarray(d_diff)))


def test_lpips_loss_delay_gate():
    rng = jax.random.PRNGKey(0)
    module = LPIPS()
    img = jax.random.uniform(rng, (1, 1, 16, 16, 3))
    params = module.init(rng, img[0], img[0])
    cfg = LossLpipsCfg(weight=1.0, apply_after_step=100)
    other = jax.random.uniform(jax.random.PRNGKey(2), img.shape)
    before = lpips_loss(cfg, params, img, other, jnp.asarray(50))
    after = lpips_loss(cfg, params, img, other, jnp.asarray(150))
    assert float(before) == 0.0


def test_lpips_params_roundtrip_and_train_wiring(tmp_path):
    """save/load of LPIPS params (.npz) preserves the tree, a torch
    state-dict path converts, and main's loader feeds the train step
    (an LPIPS part appears in the loss)."""
    rng = jax.random.PRNGKey(0)
    module = LPIPS()
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    variables = module.init(rng, img, img)

    from freesplat_tpu.training.lpips import (
        load_lpips_params,
        save_lpips_params,
    )

    path = tmp_path / "lpips.npz"
    save_lpips_params(variables, str(path))
    restored = load_lpips_params(str(path))
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # Torch state-dict route (fake lpips-package layout).
    import torch

    from tests.test_convert import fake_lpips_state_dict

    pth = tmp_path / "lpips.pth"
    torch.save(
        {k: torch.from_numpy(np.asarray(v))
         for k, v in fake_lpips_state_dict().items()},
        pth,
    )
    converted = load_lpips_params(str(pth))
    d = module.apply(converted, img, img)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    # main._load_lpips: silent None without a path, loads with one.
    from freesplat_tpu.config.config import load_config
    from freesplat_tpu.main import _load_lpips

    cfg = load_config([])
    assert _load_lpips(cfg) is None
    cfg = load_config([f"loss.lpips.weights_path={path}"])
    params = _load_lpips(cfg)
    assert params is not None

    # The loss composes the LPIPS part when params are present.
    pred = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 32, 32, 3))
    total, parts = total_loss(
        LossCfg(), pred, tgt, jnp.asarray(0), lpips_params=params
    )
    assert "lpips" in parts and np.isfinite(float(total))


def test_onecycle_schedule_shape():
    cfg = OptimizerCfg(lr=1e-4, warm_up_steps=100, max_steps=1000, cosine_lr=True)
    sched = make_schedule(cfg)
    lr0 = float(sched(0))
    lr_peak = float(sched(100))
    lr_end = float(sched(999))
    assert lr0 < lr_peak
    np.testing.assert_allclose(lr_peak, 1e-4, rtol=1e-2)
    assert lr_end < lr0 * 10


def test_checkpoint_roundtrip_and_partial():
    from freesplat_tpu.training.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "step": jnp.asarray(7, jnp.int32),
        "opt_state": {"m": jnp.ones(3)},
    }
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, 7, state)
        assert latest_step(d) == 7
        ref = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = restore_checkpoint(d, 7, ref, strict=True)
        np.testing.assert_allclose(
            np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
        )
        # Partial restore: reference has a reshaped param -> keeps fresh init.
        ref2 = {
            "params": {"w": jnp.full((4, 3), -1.0), "b": jnp.zeros(3)},
            "step": jnp.asarray(0, jnp.int32),
            "opt_state": {"m": jnp.zeros(3)},
        }
        restored2 = restore_checkpoint(d, 7, ref2, strict=False)
        np.testing.assert_allclose(np.asarray(restored2["params"]["w"]), -1.0)
        np.testing.assert_allclose(np.asarray(restored2["params"]["b"]), 0.0)
        # Optimizer state reset on partial restore.
        np.testing.assert_allclose(np.asarray(restored2["opt_state"]["m"]), 0.0)


@pytest.mark.slow
def test_bf16_trunk_matches_f32_loss_curve():
    """encoder.compute_dtype=bfloat16 (conv trunk in bf16, PTF/adapter/
    rasterizer f32) must track the f32 loss curve on a short synthetic
    overfit — the quality gate for flipping presets to bf16
    (VERDICT r2 weak item 6)."""
    import numpy as np

    from freesplat_tpu.config.config import load_config
    from freesplat_tpu.data.synthetic import SyntheticCfg, synthetic_batches
    from freesplat_tpu.training.trainer import (
        TrainCfg,
        init_state,
        make_train_step,
    )

    def run(dtype):
        cfg = load_config(
            [
                "dataset.name=synthetic",
                "dataset.image_shape=[32,64]",
                "encoder.num_depth_candidates=8",
                "encoder.adapter.sh_degree=1",
                "encoder.train_bn=false",
                f"encoder.compute_dtype={dtype}",
                "decoder.sh_degree=1",
                "optimizer.lr=2e-4",
                "optimizer.warm_up_steps=5",
                "optimizer.max_steps=100",
                "optimizer.gradient_clip_val=1.0",
            ]
        )
        batches = synthetic_batches(
            SyntheticCfg(image_shape=(32, 64), num_context=2, cache_batches=1)
        )
        batch = next(batches)
        array_batch = {
            k: {kk: vv for kk, vv in v.items() if kk != "test_fvs"}
            for k, v in batch.items()
            if k in ("context", "target")
        }
        train_cfg = TrainCfg(
            encoder=cfg.encoder, decoder=cfg.decoder,
            loss=cfg.loss, optimizer=cfg.optimizer,
        )
        state = init_state(train_cfg, jax.random.PRNGKey(0), array_batch)
        step = make_train_step(train_cfg)
        losses = []
        for _ in range(30):
            state, metrics = step(state, array_batch)
            losses.append(float(metrics["loss"]))
        return np.array(losses)

    l32 = run("float32")
    l16 = run("bfloat16")
    assert np.all(np.isfinite(l16))
    # Same optimization trajectory shape: both must be decreasing overall
    # and end within 1.5x of each other.
    assert l32[-1] < l32[0] and l16[-1] < l16[0]
    ratio = l16[-1] / l32[-1]
    assert 1 / 1.5 < ratio < 1.5, (l32[-1], l16[-1])
    # Early steps (pre-divergence-of-trajectories) agree closely.
    np.testing.assert_allclose(l16[0], l32[0], rtol=0.05)
