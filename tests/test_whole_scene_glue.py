"""Fast glue tests for parallel/whole_scene.py argument plumbing.

The sharded whole-scene pipeline tests (test_sharded_ptf.py) are
slow-marked, so a round-5 regression — ``capacity_factor`` becoming a
float (3.0) made ``render_whole_scene`` pass a FLOAT capacity into
``rasterize_sharded`` and crash ``jnp.zeros`` — survived the fast tier
and broke ``dryrun_multichip``.  This test pins the glue without
compiling any kernels: intercept the per-view ``rasterize_sharded``
call and check the static arguments.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from freesplat_tpu.models.decoder import DecoderCfg
from freesplat_tpu.models.types import Gaussians


def _tiny_gaussians(g=8):
    rng = np.random.default_rng(0)
    eye = np.tile(np.eye(3, dtype=np.float32) * 1e-2, (g, 1, 1))
    return Gaussians(
        means=jnp.asarray(rng.normal(size=(g, 3)), jnp.float32),
        covariances=jnp.asarray(eye),
        harmonics=jnp.asarray(rng.normal(size=(g, 3, 4)), jnp.float32),
        opacities=jnp.full((g,), 0.7, jnp.float32),
    )


@pytest.mark.parametrize("factor", [3.0, 1.0])
def test_render_whole_scene_capacity_is_int(monkeypatch, factor):
    from freesplat_tpu.parallel import whole_scene

    captured = {}

    def fake_rasterize_sharded(m, c, h, o, e, k, image_shape, bg, deg,
                               mesh, capacity, **kw):
        captured["capacity"] = capacity
        hh, ww = image_shape
        return (jnp.zeros((hh, ww, 3)), jnp.zeros((hh, ww)),
                jnp.zeros((hh, ww)))

    monkeypatch.setattr(
        "freesplat_tpu.parallel.sharded_render.rasterize_sharded",
        fake_rasterize_sharded,
    )

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    dec = DecoderCfg(sh_degree=1, capacity_factor=factor)
    g = _tiny_gaussians()
    v = 2
    extr = jnp.tile(jnp.eye(4), (v, 1, 1))
    intr = jnp.tile(jnp.eye(3), (v, 1, 1))
    near = jnp.full((v,), 0.5)
    far = jnp.full((v,), 10.0)

    color, depth, alpha = whole_scene.render_whole_scene(
        dec, g, extr, intr, near, far, (16, 32), mesh
    )
    # The contract rasterize_sharded needs: a concrete python int with the
    # same 32k floor as models/decoder.py render_view.
    assert type(captured["capacity"]) is int
    assert captured["capacity"] == max(
        int(factor * g.means.shape[0]), 32768
    )
    assert color.shape == (v, 16, 32, 3)
