"""Multi-chip sharded rasterization tests on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from freesplat_tpu.ops.rasterizer_ref import render_reference
from freesplat_tpu.parallel.sharded_render import rasterize_sharded
from tests.test_rasterizer_pallas import make_scene

pytestmark = pytest.mark.slow

H, W = 64, 256  # 2 x 8 tiles -> 1 tile column per device on 8 devices


@pytest.fixture(scope="module")
def mesh():
    devices = np.asarray(jax.devices()[:8])
    return Mesh(devices, ("shard",))


def test_sharded_matches_reference(mesh):
    means, cov, harm, opac, extr, intr = make_scene(n=256, seed=0, spread=3.0)
    bg = jnp.array([0.1, 0.2, 0.3])
    ref_c, ref_d, ref_a = render_reference(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1
    )
    pal_c, pal_d, pal_a = rasterize_sharded(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1,
        mesh=mesh, capacity=8 * 256,
    )
    np.testing.assert_allclose(np.asarray(pal_c), np.asarray(ref_c), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pal_d), np.asarray(ref_d), atol=3e-4)
    np.testing.assert_allclose(np.asarray(pal_a), np.asarray(ref_a), atol=3e-5)


def test_sharded_gradients_match(mesh):
    means, cov, harm, opac, extr, intr = make_scene(n=128, seed=1, spread=3.0)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.uniform(size=(H, W, 3)), dtype=jnp.float32)

    def loss_sharded(m, c, h_, o):
        color, _, _ = rasterize_sharded(
            m, c, h_, o, extr, intr, (H, W), bg, 1, mesh=mesh,
            capacity=8 * 128,
        )
        return jnp.mean((color - target) ** 2)

    def loss_ref(m, c, h_, o):
        color, _, _ = render_reference(m, c, h_, o, extr, intr, (H, W), bg, 1)
        return jnp.mean((color - target) ** 2)

    g_sh = jax.grad(loss_sharded, argnums=(0, 1, 2, 3))(means, cov, harm, opac)
    g_rf = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(means, cov, harm, opac)
    for name, a, b in zip(["means", "cov", "harm", "opac"], g_sh, g_rf):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(
            a / scale, b / scale, atol=3e-4, err_msg=f"sharded grad: {name}"
        )


def test_sharded_overflow_reported(mesh):
    """An undersized per-device slab budget must REPORT its truncation via
    the psum'd dropped count (never silently), and the scaled-down default
    budget must drop nothing on a smooth scene."""
    means, cov, harm, opac, extr, intr = make_scene(n=256, seed=4, spread=3.0)
    bg = jnp.zeros(3)
    *_, stats = rasterize_sharded(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1, mesh=mesh,
        capacity=8 * 256, per_device_capacity=64, return_stats=True,
    )
    assert int(stats["dropped"]) > 0
    *_, stats = rasterize_sharded(
        means, cov, harm, opac, extr, intr, (H, W), bg, 1, mesh=mesh,
        capacity=8 * 256, return_stats=True,
    )
    assert int(stats["dropped"]) == 0


def test_sharded_jit_under_mesh(mesh):
    """The sharded renderer composes with jit over sharded inputs."""
    means, cov, harm, opac, extr, intr = make_scene(n=256, seed=3, spread=3.0)
    bg = jnp.zeros(3)

    f = jax.jit(
        lambda m, c, h_, o: rasterize_sharded(
            m, c, h_, o, extr, intr, (H, W), bg, 1, mesh=mesh,
            capacity=8 * 256,
        )[0]
    )
    out = f(means, cov, harm, opac)
    assert out.shape == (H, W, 3)
    assert np.isfinite(np.asarray(out)).all()
