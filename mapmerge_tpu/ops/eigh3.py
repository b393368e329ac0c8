"""Closed-form batched 3x3 symmetric eigendecomposition.

jnp.linalg.eigh lowers to an iterative QDWH solve that is wasteful for huge
batches of tiny matrices, so covariance analysis (normals, Harris response,
SHOT reference frames) uses the analytic trigonometric method instead —
pure VPU element-wise math, vmappable and fully fused by XLA.

Smallest-eigenvector extraction uses the spectral projector
(A - l1 I)(A - l2 I), whose columns span the l3 eigenspace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1.0e-12


def eigvalsh3(a: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (..., 3, 3), ascending: (..., 3)."""
    a00 = a[..., 0, 0]
    a11 = a[..., 1, 1]
    a22 = a[..., 2, 2]
    a01 = a[..., 0, 1]
    a02 = a[..., 0, 2]
    a12 = a[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, _EPS)

    # det((A - qI)/p) / 2
    c00, c11, c22 = b00 / safe_p, b11 / safe_p, b22 / safe_p
    c01, c02, c12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    det_b = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    return jnp.stack([lam_min, lam_mid, lam_max], axis=-1)


def smallest_eigenpair3(a: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(eigenvalues ascending (..., 3), smallest eigenvector (..., 3), ok).

    `ok` is False where the matrix is (near-)isotropic and the returned
    direction is arbitrary (callers mask those normals out, mirroring PCL's
    NaN-normal convention for degenerate neighborhoods).
    """
    lam = eigvalsh3(a)
    eye = jnp.eye(3, dtype=a.dtype)
    m1 = a - lam[..., 2, None, None] * eye
    m2 = a - lam[..., 1, None, None] * eye
    proj = jnp.einsum(
        "...ij,...jk->...ik", m1, m2, precision=jax.lax.Precision.HIGHEST
    )
    # columns of proj span the smallest-eigenvalue eigenspace
    cols = jnp.swapaxes(proj, -1, -2)  # (..., 3 cols, 3)
    norms2 = jnp.sum(cols * cols, axis=-1)
    best = jnp.argmax(norms2, axis=-1)
    vec = jnp.take_along_axis(cols, best[..., None, None], axis=-2)[..., 0, :]
    n2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    ok = n2[..., 0] > _EPS
    vec = vec / jnp.sqrt(jnp.maximum(n2, _EPS))
    # fall back to +z where degenerate so downstream math stays finite
    vec = jnp.where(ok[..., None], vec, jnp.asarray([0.0, 0.0, 1.0], a.dtype))
    return lam, vec, ok
