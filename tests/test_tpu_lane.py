"""On-hardware kernel lane (VERDICT r2 item 5).

Interpret-mode CPU tests cannot catch Mosaic layout errors (the 10-row
DMA-slice class documented at docs/PERFORMANCE.md); this marker selects a
~2-minute subset that must be run on the real chip every round:

    FREESPLAT_TEST_TPU=1 python -m pytest -m tpu_lane -q

On CPU these tests still run (interpret mode) as part of the normal
tiers; the marker only selects, it never skips.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.tpu_lane
def test_train_step_compiles_and_runs():
    """One jitted full-model train step (encoder -> PTF -> Pallas render
    -> loss -> grads -> adam) at a small shape: compiles the fwd AND bwd
    Pallas kernels inside the real train graph on whatever backend this
    tier targets."""
    from freesplat_tpu.config.config import load_config
    from freesplat_tpu.data.synthetic import SyntheticCfg, synthetic_batches
    from freesplat_tpu.training.trainer import (
        TrainCfg,
        init_state,
        make_train_step,
    )

    cfg = load_config(
        [
            "dataset.name=synthetic",
            "dataset.image_shape=[32,64]",
            "encoder.num_depth_candidates=8",
            "encoder.adapter.sh_degree=1",
            "encoder.train_bn=false",
            "decoder.sh_degree=1",
            "optimizer.warm_up_steps=2",
            "optimizer.max_steps=10",
            "optimizer.gradient_clip_val=1.0",
        ]
    )
    batch = next(
        synthetic_batches(SyntheticCfg(image_shape=(32, 64), num_context=2))
    )
    train_cfg = TrainCfg(
        encoder=cfg.encoder,
        decoder=cfg.decoder,
        loss=cfg.loss,
        optimizer=cfg.optimizer,
    )
    array_batch = {
        k: {kk: vv for kk, vv in v.items() if kk != "test_fvs"}
        for k, v in batch.items()
        if k in ("context", "target")
    }
    state = init_state(
        train_cfg, jax.random.PRNGKey(0), array_batch
    )
    step = make_train_step(train_cfg)
    state, metrics = step(state, array_batch)
    loss = float(metrics["loss"])
    psnr = float(metrics["psnr"])
    assert np.isfinite(loss) and loss > 0
    assert np.isfinite(psnr)
    assert int(state["step"]) == 1


@pytest.mark.tpu_lane
def test_ssim_bounded_near_identity():
    """SSIM must stay <= 1 for near-identical images ON HARDWARE: the
    default bf16 MXU conv precision cancels catastrophically in the
    variance terms (r3 finding: the 384x512 overfit harness reported
    SSIM 1.08; true value 0.995).  CPU runs are exact and cannot catch
    this — the assert only bites on the chip."""
    from freesplat_tpu.training.metrics import compute_ssim

    rng = np.random.default_rng(3)
    gt = jnp.asarray(rng.uniform(0, 1, (2, 128, 160, 3)), jnp.float32)
    pred = jnp.clip(
        gt + jnp.asarray(rng.normal(size=gt.shape) * 0.004, jnp.float32),
        0, 1,
    )
    vals = np.asarray(jax.jit(compute_ssim)(gt, pred))
    assert np.all(vals <= 1.0 + 1e-5), vals
    assert np.all(vals > 0.97), vals
