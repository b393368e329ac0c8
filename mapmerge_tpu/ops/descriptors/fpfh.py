"""FPFH-33 descriptors.

TPU-native equivalent of pcl::FPFHEstimation (reference
dispatch_descriptors.h:40, FPFHSignature33): Simplified Point Feature
Histograms per surface point, then distance-weighted aggregation over each
keypoint's neighborhood.

Shapes are fixed: neighborhoods are the capped radius gather
(ops/neighbors.radius_neighbors, nearest-first), pair features come from the
shared Darboux core, and histograms are one-hot matmuls. PCL semantics kept:
- SPFH sub-histograms (11 bins each for theta/alpha/phi) normalized to
  sum 100 over the neighborhood;
- FPFH(keypoint) = sum over its surface neighbors j (distance > 0) of
  (1/d_j) SPFH_j, then each 11-bin block renormalized to 100 (PCL's
  weightPointSPFHSignature, which skips zero-distance self hits);
- descriptors with empty neighborhoods are invalid (the reference drops
  them with their keypoints, features.cpp:118-141; we mask);
- SPFH is computed ONLY at the keypoints' neighbor points — exactly PCL's
  computeSPFHSignatures optimization (it collects the distinct neighbor
  set of the requested indices, fpfh.hpp): K*M queries instead of P.
  At the 500k eval config that is ~50k SPFH evaluations instead of 420k
  (duplicated neighbors recompute; a fixed-shape program cannot dedupe,
  and the waste is far below the 8x saving).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mapmerge_tpu.core.cloud import PointCloud
from mapmerge_tpu.ops.descriptors.base import Descriptors
from mapmerge_tpu.ops.descriptors.darboux import (
    bin_index,
    one_hot_histogram,
    pair_features,
)
from mapmerge_tpu.ops.keypoints.harris import Keypoints
from mapmerge_tpu.ops.neighbors import radius_neighbors
from mapmerge_tpu.ops.normals import SurfaceNormals

_BINS = 11
_PI = float(jnp.pi)


def _spfh_at(
    q_xyz: jax.Array,
    q_nrm: jax.Array,
    q_ok: jax.Array,
    cloud: PointCloud,
    normals: SurfaceNormals,
    radius: float,
    max_neighbors: int,
    tile: int,
    engine: str = "auto",
    scan_cap: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """SPFH (Q, 33) at the given oriented query points + validity (Q,).

    Computed in slabs under lax.map: the one-hot histograms are
    (slab, M, 11) — unchunked at large Q they are GBs of HBM (measured TPU
    worker crash at the 500k eval config)."""
    p_ok = cloud.mask & normals.valid
    idx, d2, nmask = radius_neighbors(
        q_xyz, cloud.xyz, radius, max_neighbors,
        p_mask=p_ok, tile=tile, engine=engine, scan_cap=scan_cap,
    )
    # the query is drawn from the cloud: exclude its own zero-distance hit
    # (PCL SPFH pairs each point with its neighbors, not itself)
    nmask = nmask & (d2 > 1e-12)

    q = q_xyz.shape[0]
    chunk = min(q, 32768)
    pad = (-q) % chunk

    def pad0(a):
        return (
            jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            if pad
            else a
        )

    xyz_s = pad0(q_xyz).reshape(-1, chunk, 3)
    nrm_s = pad0(q_nrm).reshape(-1, chunk, 3)
    ok_s = pad0(q_ok).reshape(-1, chunk)
    idx_s = pad0(idx).reshape(-1, chunk, idx.shape[-1])
    nmask_s = pad0(nmask).reshape(-1, chunk, nmask.shape[-1])

    def slab(args):
        sxyz, snrm, sok, sidx, snmask = args
        nbr_xyz = cloud.xyz[sidx]  # (chunk, M, 3)
        nbr_nrm = normals.normals[sidx]
        theta, alpha, phi, _, pair_ok = pair_features(
            sxyz[:, None, :], snrm[:, None, :], nbr_xyz, nbr_nrm
        )
        w = (snmask & pair_ok & sok[:, None]).astype(jnp.float32)
        h_theta = one_hot_histogram(bin_index(theta, -_PI, _PI, _BINS), w, _BINS)
        h_alpha = one_hot_histogram(bin_index(alpha, -1.0, 1.0, _BINS), w, _BINS)
        h_phi = one_hot_histogram(bin_index(phi, -1.0, 1.0, _BINS), w, _BINS)
        total = jnp.sum(w, axis=-1, keepdims=True)
        scale = jnp.where(total > 0, 100.0 / jnp.maximum(total, 1.0), 0.0)
        spfh = jnp.concatenate([h_theta, h_alpha, h_phi], axis=-1) * scale
        return spfh, total[:, 0]

    spfh, total = jax.lax.map(slab, (xyz_s, nrm_s, ok_s, idx_s, nmask_s))
    spfh = spfh.reshape(-1, 3 * _BINS)[:q]
    total = total.reshape(-1)[:q]
    return spfh, q_ok & (total > 0)


def compute_fpfh(
    cloud: PointCloud,
    normals: SurfaceNormals,
    keypoints: Keypoints,
    radius: float,
    max_neighbors: int = 64,
    tile: int = 1024,
    engine: str = "auto",
    scan_cap: int = 128,
) -> Descriptors:
    """FPFH-33 at each keypoint over the full-resolution search surface
    (reference features.cpp:99-150 template instantiated with
    pcl::FPFHEstimation)."""
    p_ok = cloud.mask & normals.valid
    idx, d2, nmask = radius_neighbors(
        keypoints.xyz, cloud.xyz, radius, max_neighbors,
        p_mask=p_ok, tile=tile, engine=engine, scan_cap=scan_cap,
    )  # (K, M) keypoint neighborhoods

    # SPFH only at the gathered neighbor points (PCL computeSPFHSignatures)
    flat_idx = idx.reshape(-1)  # (K*M,)
    q_xyz = cloud.xyz[flat_idx]
    q_nrm = normals.normals[flat_idx]
    q_ok = p_ok[flat_idx] & nmask.reshape(-1)
    spfh_flat, spfh_ok_flat = _spfh_at(
        q_xyz, q_nrm, q_ok, cloud, normals, radius, max_neighbors, tile,
        engine, scan_cap,
    )
    spfh = spfh_flat.reshape(idx.shape[0], idx.shape[1], 3 * _BINS)
    spfh_ok = spfh_ok_flat.reshape(idx.shape)

    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    w = jnp.where(
        nmask & spfh_ok & (dist > 1e-9) & keypoints.mask[:, None],
        1.0 / jnp.maximum(dist, 1e-9),
        0.0,
    )  # (K, M)
    fpfh = jnp.einsum(
        "km,kmd->kd", w, spfh, precision=jax.lax.Precision.HIGHEST
    )

    # renormalize each 11-bin block to sum 100
    blocks = fpfh.reshape(-1, 3, _BINS)
    sums = jnp.sum(blocks, axis=-1, keepdims=True)
    blocks = jnp.where(sums > 0, blocks * (100.0 / jnp.maximum(sums, 1e-9)), 0.0)
    data = blocks.reshape(-1, 3 * _BINS)

    valid = keypoints.mask & (jnp.sum(w, axis=-1) > 0)
    return Descriptors(data=jnp.where(valid[:, None], data, 0.0), valid=valid)
