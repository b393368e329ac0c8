"""Weighted rigid (SE(3)) alignment — batched, closed-form.

TPU-native equivalent of pcl::registration::TransformationEstimationSVD
(reference src/matching.cpp:135-137, Umeyama without scale): least-squares
rotation+translation from weighted point correspondences.

Instead of an iterative SVD, the 3x3 cross-covariance is decomposed through
the analytic symmetric eigensolver (ops/eigh3) on H^T H; the third singular
vector pair is reconstructed by cross products, which makes the solve exact
for the rank-2 cross-covariances that every 3-point RANSAC sample produces
(3 coplanar pairs) and automatically yields det(R) = +1 (the Umeyama
reflection correction). Fully vmappable: thousands of hypotheses solve in
one fused program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.ops.eigh3 import eigvalsh3

_EPS = 1.0e-12


def _eigvecs_from_vals(a: jax.Array, lam: jax.Array) -> jax.Array:
    """Eigenvectors of symmetric (..., 3, 3) for ascending eigenvalues lam.

    v_i from the spectral projector prod_{j!=i}(A - lam_j I); near-degenerate
    pairs are disambiguated by orthogonalization against the best-separated
    eigenvector.
    """
    eye = jnp.eye(3, dtype=a.dtype)

    def projector_vec(l_a: jax.Array, l_b: jax.Array) -> jax.Array:
        m = jnp.einsum(
            "...ij,...jk->...ik",
            a - l_a[..., None, None] * eye,
            a - l_b[..., None, None] * eye,
            precision=jax.lax.Precision.HIGHEST,
        )
        cols = jnp.swapaxes(m, -1, -2)
        norms = jnp.sum(cols * cols, axis=-1)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(cols, best[..., None, None], axis=-2)[..., 0, :]
        n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
        return v / n

    v0 = projector_vec(lam[..., 1], lam[..., 2])  # smallest
    v2 = projector_vec(lam[..., 0], lam[..., 1])  # largest
    v1 = jnp.cross(v2, v0)
    n1 = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=-1, keepdims=True), _EPS))
    v1 = v1 / n1
    return jnp.stack([v0, v1, v2], axis=-1)  # columns = eigenvectors


def kabsch(
    src: jax.Array,
    dst: jax.Array,
    weights: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Weighted least-squares rigid transform T with T@src ~= dst.

    Args:
      src, dst: (..., N, 3) corresponding points.
      weights:  (..., N) nonnegative weights (0 = ignore pair).

    Returns:
      (transform (..., 4, 4) float32, ok (...) bool). `ok` is False when the
      problem is degenerate (fewer than 3 effective pairs or collinear
      support); the returned transform is identity there.
    """
    w = weights.astype(jnp.float32)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    denom = jnp.maximum(wsum, _EPS)
    mu_s = jnp.sum(src * w[..., None], axis=-2) / denom
    mu_d = jnp.sum(dst * w[..., None], axis=-2) / denom
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    # cross-covariance H = sum w * sc dc^T  (3x3)
    h = jnp.einsum(
        "...ni,...nj->...ij",
        sc * w[..., None],
        dc,
        precision=jax.lax.Precision.HIGHEST,
    )

    # SVD via analytic eigh of H^T H
    hth = jnp.einsum(
        "...ji,...jk->...ik", h, h, precision=jax.lax.Precision.HIGHEST
    )
    lam = eigvalsh3(hth)  # ascending
    v = _eigvecs_from_vals(hth, lam)  # columns v0(small) v1 v2(large)

    # u_i = H v_i / sigma_i for the two largest; third by cross product
    u2 = jnp.einsum("...ij,...j->...i", h, v[..., 2])
    u1 = jnp.einsum("...ij,...j->...i", h, v[..., 1])

    def _norm(x):
        return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), _EPS))

    u2n = u2 / _norm(u2)
    # orthogonalize u1 against u2 for numerical safety
    u1 = u1 - jnp.sum(u1 * u2n, axis=-1, keepdims=True) * u2n
    u1n = u1 / _norm(u1)
    u0n = jnp.cross(u2n, u1n)
    # rebuild right-handed triads consistently: columns (large->small)
    u = jnp.stack([u2n, u1n, u0n], axis=-1)
    vv = jnp.stack([v[..., 2], v[..., 1], jnp.cross(v[..., 2], v[..., 1])], axis=-1)
    # R = V U^T maximizes tr(R H) for H = sum sc dc^T
    r = jnp.einsum(
        "...ik,...jk->...ij", vv, u, precision=jax.lax.Precision.HIGHEST
    )

    t = mu_d - jnp.einsum("...ij,...j->...i", r, mu_s)
    transform = tf.from_rotation_translation(r, t)

    # degeneracy: need >= 3 effective pairs, non-collinear support
    # (sigma_2 = sqrt(lam_1) meaningfully nonzero), and a certified proper
    # rotation — near-degenerate eigenvector extraction can emit a
    # non-orthogonal R that collapses points and cheats downstream scoring
    eff = jnp.sum((w > 0).astype(jnp.int32), axis=-1) >= 3
    scale2 = jnp.maximum(lam[..., 2], _EPS)
    nondegenerate = lam[..., 1] / scale2 > 1.0e-6
    rtr = jnp.einsum(
        "...ji,...jk->...ik", r, r, precision=jax.lax.Precision.HIGHEST
    )
    ortho_err = jnp.max(
        jnp.abs(rtr - jnp.eye(3, dtype=r.dtype)), axis=(-2, -1)
    )
    det_r = jnp.linalg.det(r)
    proper = (ortho_err < 1.0e-2) & (jnp.abs(det_r - 1.0) < 1.0e-2)
    ok = eff & nondegenerate & (wsum[..., 0] > 0) & proper
    transform = jnp.where(
        ok[..., None, None], transform, jnp.eye(4, dtype=jnp.float32)
    )
    return transform, ok
