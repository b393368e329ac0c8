"""SIFT 3D keypoint detection on color intensity.

TPU-native equivalent of pcl::SIFTKeypoint<PointXYZRGB, PointWithScale> as
configured by the reference (src/features.cpp:45-62, 92): scale-space
difference-of-Gaussians over the RGB intensity channel
(PCL IntensityFieldAccessor: (299 R + 587 G + 114 B) / 1000 with 8-bit
channels), fixed 3 octaves x 3 scales per octave with min_scale =
registration resolution, and min_contrast = keypoint_threshold.

Per octave (base scale doubling each octave, PCL sift_keypoint.hpp):
  1. nr_scales+3 Gaussian-smoothed intensity fields, each one tiled
     (tile, P) MXU pass: w_s = exp(-d^2 / 2 sigma_s^2) bounded at 3 sigma_max;
     smoothed = (w @ I) / (w @ 1);
  2. DoG between adjacent scales;
  3. extrema: a point is a keypoint at interior DoG level s if its value is
     the strict max or min among its 25 spatial nearest neighbors' values at
     levels s-1, s, s+1 and |DoG| > min_contrast (PCL compares the same
     spatial neighborhood across the three levels).
Keypoints from all octaves are pooled and the top `max_keypoints` by |DoG|
kept (fixed capacity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mapmerge_tpu.core.cloud import FAR, PointCloud
from mapmerge_tpu.ops.keypoints.harris import Keypoints
from mapmerge_tpu.ops.neighbors import BIG, radius_neighbors, sq_dists, tiled_query, _center

_KNN = 25  # PCL's spatial neighborhood for extremum tests


def _intensity(rgb: jax.Array) -> jax.Array:
    """PCL IntensityFieldAccessor<PointXYZRGB>: (299R+587G+114B)/1000, 8-bit
    channels (our rgb is [0,1], so scale by 255 to match PCL magnitudes —
    min_contrast thresholds then carry over)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return (299.0 * r + 587.0 * g + 114.0 * b) * (255.0 / 1000.0)


def _scale_space(
    cloud: PointCloud,
    intensity: jax.Array,
    sigmas: list[float],
    tile: int,
) -> jax.Array:
    """Gaussian-smoothed intensities for every sigma: (S, P)."""
    max_sigma = max(sigmas)
    r2_bound = jnp.float32((3.0 * max_sigma) ** 2)
    qc, pc = _center(cloud.xyz, cloud.xyz, cloud.mask)
    vals = jnp.where(cloud.mask, intensity, 0.0)
    maskf = cloud.mask.astype(jnp.float32)

    def tile_fn(q_slab):
        d2 = sq_dists(q_slab, pc)
        bounded = (d2 <= r2_bound).astype(jnp.float32) * maskf[None, :]
        outs = []
        for s in sigmas:
            w = jnp.exp(-d2 / jnp.float32(2.0 * s * s)) * bounded
            num = jnp.dot(
                w, vals[:, None], precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )[:, 0]
            den = jnp.sum(w, axis=-1)
            outs.append(num / jnp.maximum(den, 1e-12))
        return jnp.stack(outs, axis=-1)  # (tile, S)

    out = tiled_query(qc, pc, tile_fn, tile)  # (P, S)
    return out.T  # (S, P)


def detect_keypoints_sift(
    cloud: PointCloud,
    min_scale: float,
    octaves: int,
    scales_per_octave: int,
    min_contrast: float,
    max_keypoints: int,
    tile: int = 1024,
) -> Keypoints:
    """Reference features.cpp:45-62: setScales(min_scale, octaves, scales),
    setMinimumContrast(min_contrast)."""
    p = cloud.capacity
    # spatial neighborhood for extremum tests (pure k-NN; radius unbounded)
    knn = min(_KNN + 1, p)
    idx, _, nmask = radius_neighbors(
        cloud.xyz, cloud.xyz, radius=1.0e6, k=knn,
        p_mask=cloud.mask, tile=tile,
    )
    # slot 0 is the point itself (distance 0); neighbors are 1..
    nbr_idx = idx[:, 1:]
    nbr_ok = nmask[:, 1:]

    intensity = _intensity(cloud.rgb)

    cand_resp = []
    cand_mask = []
    base = float(min_scale)
    for _ in range(octaves):
        n_s = scales_per_octave + 3
        sigmas = [base * (2.0 ** (s / scales_per_octave)) for s in range(n_s)]
        smoothed = _scale_space(cloud, intensity, sigmas, tile)  # (S, P)
        dog = smoothed[1:] - smoothed[:-1]  # (S-1, P)

        for s in range(1, dog.shape[0] - 1):
            val = dog[s]  # (P,)
            # neighbor DoG values across the three adjacent levels
            levels = dog[s - 1 : s + 2]  # (3, P)
            nbr_vals = levels[:, nbr_idx]  # (3, P, K)
            nbr_vals = jnp.where(nbr_ok[None], nbr_vals, jnp.nan)
            own_adjacent = jnp.stack([dog[s - 1], dog[s + 1]])  # (2, P)
            hi = jnp.fmax(
                jnp.nanmax(nbr_vals, axis=(0, 2)), jnp.max(own_adjacent, axis=0)
            )
            lo = jnp.fmin(
                jnp.nanmin(nbr_vals, axis=(0, 2)), jnp.min(own_adjacent, axis=0)
            )
            is_ext = (val > hi) | (val < lo)
            keep = cloud.mask & is_ext & (jnp.abs(val) > min_contrast)
            cand_resp.append(jnp.where(keep, jnp.abs(val), -BIG))
            cand_mask.append(keep)
        base *= 2.0

    resp_all = jnp.concatenate(cand_resp)  # (L*P,)
    k = min(max_keypoints, resp_all.shape[0])
    top_resp, top_i = jax.lax.top_k(resp_all, k)
    kp_mask = top_resp > -BIG / 2
    point_i = top_i % p
    kp_xyz = jnp.where(kp_mask[:, None], cloud.xyz[point_i], FAR)
    if k < max_keypoints:
        pad = max_keypoints - k
        kp_xyz = jnp.concatenate(
            [kp_xyz, jnp.full((pad, 3), FAR, jnp.float32)]
        )
        top_resp = jnp.concatenate([top_resp, jnp.zeros((pad,))])
        kp_mask = jnp.concatenate([kp_mask, jnp.zeros((pad,), bool)])
    return Keypoints(
        xyz=kp_xyz,
        response=jnp.where(kp_mask, top_resp, 0.0),
        mask=kp_mask,
    )
