"""Discrete probability distribution sampling utilities.

Parity target: ``src/misc/discrete_probability_distribution.py`` —
``sample_discrete_distribution`` (inverse-CDF sampling via searchsorted)
and ``gather_discrete_topk``.  Used by the legacy pixelSplat epipolar
sampler (optional component) and handy for stochastic depth sampling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_discrete_distribution(
    pdf: jnp.ndarray,  # (..., bucket)
    rng: jax.Array,
    num_samples: int,
    eps: float = 1e-10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample bucket indices from per-row pdfs.

    Returns (index (..., sample) int32, densities (..., sample) —
    normalized pdf values at the samples).
    """
    *batch, buckets = pdf.shape
    normalized = pdf / jnp.maximum(
        jnp.sum(pdf, axis=-1, keepdims=True), eps
    )
    cdf = jnp.cumsum(normalized, axis=-1)
    u = jax.random.uniform(rng, (*batch, num_samples), dtype=pdf.dtype)
    flat_cdf = cdf.reshape(-1, buckets)
    flat_u = u.reshape(-1, num_samples)
    idx = jax.vmap(
        lambda c, q: jnp.searchsorted(c, q, side="left")
    )(flat_cdf, flat_u)
    idx = jnp.clip(idx, 0, buckets - 1).reshape(*batch, num_samples)
    dens = jnp.take_along_axis(normalized, idx, axis=-1)
    return idx.astype(jnp.int32), dens


def gather_discrete_topk(
    pdf: jnp.ndarray,  # (..., bucket)
    num_samples: int,
    eps: float = 1e-10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k buckets by pdf mass; same return contract as sampling."""
    normalized = pdf / jnp.maximum(
        jnp.sum(pdf, axis=-1, keepdims=True), eps
    )
    dens, idx = jax.lax.top_k(normalized, num_samples)
    return idx.astype(jnp.int32), dens
