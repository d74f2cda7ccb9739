"""Growing-bucket PTF driver vs the single-buffer scan (VERDICT r4 #5).

``fuse_views_bucketed`` must be BIT-identical to ``fuse_views``: invalid
tail slots never project, never win the z-buffer, and are never
scattered into, so running the early views in a smaller buffer cannot
change any fusion decision.  (``fuse_views`` itself is pinned against
the reference's ``fuse_gaussians`` torch code in
test_ptf_reference_parity.py.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from freesplat_tpu.models.ptf import fuse_views, fuse_views_bucketed
from tests.test_sharded_ptf import make_gru, make_inputs


def _compare(v, seed, buckets=None, use_scan=None):
    import functools

    feats, coords, dens, wts, depths, extr, intr, shape = make_inputs(
        v=v, seed=seed
    )
    gru_apply = make_gru(feats.shape[-1])
    # jit the reference exactly like the harness does (phase C1): eager
    # dispatch rounds the GRU matmuls differently (no FMA fusion), which
    # is NOT the production numerics being certified.
    ref = jax.jit(
        functools.partial(
            fuse_views, image_shape=shape, gru_apply=gru_apply,
            use_scan=use_scan,
        )
    )(feats, coords, dens, wts, depths, extr, intr)
    out = fuse_views_bucketed(
        feats, coords, dens, wts, depths, extr, intr, shape, gru_apply,
        buckets=buckets,
    )
    np.testing.assert_array_equal(
        np.asarray(ref.valid), np.asarray(out.valid)
    )
    for name in ("feat", "coords", "density", "weight", "depth",
                 "extrinsics"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(out, name)),
            err_msg=name,
        )
    merged = int(np.asarray(ref.valid).sum())
    assert 0 < merged < v * feats.shape[1]  # PTF really merged something
    return merged


def test_bucketed_matches_scan_default_buckets():
    _compare(v=8, seed=0, use_scan=True)


def test_bucketed_matches_unrolled_small():
    _compare(v=3, seed=1, use_scan=False)


def test_bucketed_matches_with_explicit_buckets():
    # uneven buckets incl. a no-op segment boundary (4 -> 4 views)
    _compare(v=9, seed=2, buckets=(2, 4, 4, 7, 9))


def test_bucketed_single_bucket_degenerates_to_scan():
    _compare(v=6, seed=3, buckets=(6,))


def test_bucket_normalization_clips_and_appends_final():
    # buckets beyond v are clipped; v is always appended
    _compare(v=5, seed=4, buckets=(2, 64))
