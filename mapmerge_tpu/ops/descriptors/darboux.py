"""Darboux-frame pair features — the shared core of PFH/FPFH/PFHRGB.

Equivalent of pcl::computePairFeatures as exercised through the reference's
descriptor estimators (dispatch_descriptors.h:38-40): for a pair of oriented
points, the (theta, alpha, phi, d) angular features, including PCL's
role-swap rule that makes the point whose normal is better aligned with the
connecting line the frame source. Pure element-wise math — vmappable over
(N, M) gathered neighbor pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1.0e-12


def pair_features(
    p1: jax.Array,
    n1: jax.Array,
    p2: jax.Array,
    n2: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Compute (theta, alpha, phi, dist, ok) for broadcastable point pairs.

    theta in [-pi, pi], alpha in [-1, 1], phi in [-1, 1], dist >= 0.
    `ok` is False for coincident points or degenerate frames (PCL returns
    false from computePairFeatures there).
    """
    d = p2 - p1
    dist2 = jnp.sum(d * d, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, _EPS))
    ok = dist2 > _EPS
    dhat = d / dist[..., None]

    # role swap: source = point whose normal makes the smaller angle with
    # the connecting line (compare |cos| descending == acos ascending)
    cos1 = jnp.sum(n1 * dhat, axis=-1)
    cos2 = jnp.sum(n2 * -dhat, axis=-1)
    swap = jnp.abs(cos1) < jnp.abs(cos2)

    ns = jnp.where(swap[..., None], n2, n1)
    nt = jnp.where(swap[..., None], n1, n2)
    dst = jnp.where(swap[..., None], -dhat, dhat)
    phi = jnp.where(swap, cos2, cos1)

    u = ns
    v = jnp.cross(dst, u)
    vnorm2 = jnp.sum(v * v, axis=-1)
    frame_ok = vnorm2 > _EPS
    v = v / jnp.sqrt(jnp.maximum(vnorm2, _EPS))[..., None]
    w = jnp.cross(u, v)

    alpha = jnp.sum(v * nt, axis=-1)
    theta = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(u * nt, axis=-1))
    return theta, alpha, phi, dist, ok & frame_ok


def bin_index(value: jax.Array, lo: float, hi: float, bins: int) -> jax.Array:
    """Uniform bin index in [0, bins-1] (PCL floor-and-clip binning)."""
    idx = jnp.floor((value - lo) / (hi - lo) * bins).astype(jnp.int32)
    return jnp.clip(idx, 0, bins - 1)


def one_hot_histogram(
    idx: jax.Array, weights: jax.Array, bins: int
) -> jax.Array:
    """Weighted histogram over the last axis: (..., M) idx/weights -> (..., bins)."""
    oh = jax.nn.one_hot(idx, bins, dtype=jnp.float32)
    return jnp.einsum("...m,...mb->...b", weights.astype(jnp.float32), oh)
