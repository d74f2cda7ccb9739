"""BN statistics-regime parity vs torch (VERDICT r4 missing #3).

The reference's ``set_bn_eval`` actually calls ``m.train()`` on every BN
layer (``encoder_freesplat.py:80-82``), i.e. its evals normalize with
BATCH statistics.  Our default eval uses running averages (documented
deviation, docs/PARITY.md); ``test.bn_batch_stats=true`` opts into the
reference regime.  These tests pin both regimes of our ``BNAct`` against
``torch.nn.BatchNorm2d`` (values AND updated running buffers), the
``_bn_apply`` harness helper, and the config plumbing.
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesplat_tpu.models.backbone import BNAct

B, H, W, C = 2, 4, 6, 8


@pytest.fixture()
def data():
    rng = np.random.default_rng(0)
    x = rng.normal(1.5, 2.0, (B, H, W, C)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, C).astype(np.float32)
    bias = rng.normal(0, 0.3, C).astype(np.float32)
    ra_mean = rng.normal(0, 1.0, C).astype(np.float32)
    ra_var = rng.uniform(0.5, 3.0, C).astype(np.float32)
    return x, scale, bias, ra_mean, ra_var


def _ours(x, scale, bias, ra_mean, ra_var, use_running_average):
    mod = BNAct(use_running_average, act=False)
    variables = {
        "params": {"bn": {"scale": jnp.asarray(scale),
                          "bias": jnp.asarray(bias)}},
        "batch_stats": {"bn": {"mean": jnp.asarray(ra_mean),
                               "var": jnp.asarray(ra_var)}},
    }
    if use_running_average:
        return np.asarray(mod.apply(variables, jnp.asarray(x))), None
    out, mut = mod.apply(
        variables, jnp.asarray(x), mutable=["batch_stats"]
    )
    return np.asarray(out), jax.tree_util.tree_map(
        np.asarray, mut["batch_stats"]["bn"]
    )


def _torch_bn(x, scale, bias, ra_mean, ra_var, train):
    import torch

    bn = torch.nn.BatchNorm2d(C, eps=1e-3, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(ra_mean))
        bn.running_var.copy_(torch.from_numpy(ra_var))
    bn.train(train)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        y = bn(xt)
    return (
        y.permute(0, 2, 3, 1).numpy(),
        bn.running_mean.numpy().copy(),
        bn.running_var.numpy().copy(),
    )


def test_running_average_regime_matches_torch_eval(data):
    """Our default eval (running averages) == torch eval-mode BN."""
    x, scale, bias, ra_mean, ra_var = data
    ours, _ = _ours(x, scale, bias, ra_mean, ra_var, True)
    theirs, m, v = _torch_bn(x, scale, bias, ra_mean, ra_var, False)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    # eval mode must not touch the buffers
    np.testing.assert_array_equal(m, ra_mean)
    np.testing.assert_array_equal(v, ra_var)


def test_batch_stats_regime_matches_torch_train(data):
    """test.bn_batch_stats regime == torch train-mode BN (the reference's
    set_bn_eval semantics): normalization uses the BIASED batch variance
    on both sides, so outputs are bit-compatible."""
    x, scale, bias, ra_mean, ra_var = data
    ours, mut = _ours(x, scale, bias, ra_mean, ra_var, False)
    theirs, m, v = _torch_bn(x, scale, bias, ra_mean, ra_var, True)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # Update conventions: flax momentum=0.9 keeps 0.9 of the old value,
    # torch momentum=0.1 keeps 1-0.1 — identical blend.  Means agree
    # directly; torch blends in the UNBIASED batch variance (n/(n-1))
    # while flax blends the biased one, so correct before comparing.
    # (Irrelevant for reference parity — set_bn_eval means the running
    # buffers are never READ — but pin the convention so checkpoint
    # round-trips are understood.)
    n = B * H * W
    batch_mean = x.reshape(-1, C).mean(0)
    batch_var = x.reshape(-1, C).var(0)
    np.testing.assert_allclose(
        mut["mean"], 0.9 * ra_mean + 0.1 * batch_mean, rtol=1e-5
    )
    np.testing.assert_allclose(m, 0.9 * ra_mean + 0.1 * batch_mean,
                               rtol=1e-5)
    np.testing.assert_allclose(
        mut["var"], 0.9 * ra_var + 0.1 * batch_var, rtol=1e-5
    )
    np.testing.assert_allclose(
        v, 0.9 * ra_var + 0.1 * batch_var * n / (n - 1), rtol=1e-5
    )


def test_bn_apply_helper_switches_regime(data):
    """The harness _bn_apply wrapper: batch-stats mode must change the
    output (running stats are skewed on purpose) and must NOT leak
    mutable state to the caller."""
    from freesplat_tpu.evaluation.harness import _bn_apply

    x, scale, bias, ra_mean, ra_var = data
    mod = BNAct(False, act=False)  # train_bn=True analogue
    variables = {
        "params": {"bn": {"scale": jnp.asarray(scale),
                          "bias": jnp.asarray(bias)}},
        "batch_stats": {"bn": {"mean": jnp.asarray(ra_mean),
                               "var": jnp.asarray(ra_var)}},
    }
    enc_batch = types.SimpleNamespace(
        cfg=types.SimpleNamespace(train_bn=True), apply=mod.apply
    )
    out_batch = _bn_apply(enc_batch, variables)(jnp.asarray(x))
    expected, _ = _ours(x, scale, bias, ra_mean, ra_var, False)
    np.testing.assert_allclose(np.asarray(out_batch), expected, atol=1e-6)

    mod_run = BNAct(True, act=False)
    enc_run = types.SimpleNamespace(
        cfg=types.SimpleNamespace(train_bn=False), apply=mod_run.apply
    )
    out_run = _bn_apply(enc_run, variables)(jnp.asarray(x))
    # skewed running stats => the two regimes genuinely differ
    assert np.abs(np.asarray(out_run) - np.asarray(out_batch)).max() > 0.1


def test_config_plumbing():
    from freesplat_tpu.config.config import load_config

    cfg = load_config(["test.bn_batch_stats=false"])
    assert cfg.test.bn_batch_stats is False
    # Default = the reference's regime (batch statistics at test): +1.47
    # dB on a trained model AND checkpoint-compatible with the reference.
    assert load_config([]).test.bn_batch_stats is True


def test_harness_runs_with_batch_stats_regime(tmp_path):
    """End-to-end run_test with the reference BN regime: the real
    EfficientNetV2S backbone runs with batch statistics at test and the
    mutable updates are discarded (state stays pure)."""
    from freesplat_tpu.config.config import load_config
    from freesplat_tpu.data.synthetic import SyntheticCfg, synthetic_batches
    from freesplat_tpu.evaluation.harness import run_test

    cfg = load_config(
        [
            "dataset.name=synthetic",
            "dataset.image_shape=[32,32]",
            "encoder.num_depth_candidates=8",
            "encoder.adapter.sh_degree=1",
            "decoder.sh_degree=1",
            "test.bn_batch_stats=true",
            f"test.output_path={tmp_path}/test_out",
        ]
    )
    batches = synthetic_batches(
        SyntheticCfg(image_shape=(32, 32), num_context=2, num_target=2)
    )
    summary = run_test(cfg, batches=batches, max_scenes=1)
    assert "psnr" in summary and np.isfinite(summary["psnr"])
