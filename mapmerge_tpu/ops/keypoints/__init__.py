"""Keypoint detector dispatch (reference features.cpp:85-97)."""

from __future__ import annotations

from mapmerge_tpu.core.cloud import PointCloud
from mapmerge_tpu.core.enums import Keypoint
from mapmerge_tpu.ops.keypoints.harris import Keypoints, detect_keypoints_harris
from mapmerge_tpu.ops.normals import SurfaceNormals


def detect_keypoints(
    cloud: PointCloud,
    normals: SurfaceNormals,
    kind: Keypoint,
    threshold: float,
    radius: float,
    resolution: float,
    max_keypoints: int,
    tile: int = 1024,
    sift_octaves: int = 3,
    sift_scales_per_octave: int = 3,
    engine: str = "auto",
    scan_cap: int = 128,
) -> Keypoints:
    """Dispatch mirroring the reference switch (features.cpp:85-97):
    SIFT(min_scale=resolution, octaves, scales, min_contrast=threshold) or
    HARRIS(threshold, radius) with NMS + refine."""
    if kind == Keypoint.HARRIS:
        return detect_keypoints_harris(
            cloud, normals, threshold=threshold, radius=radius,
            max_keypoints=max_keypoints, tile=tile, engine=engine,
            scan_cap=scan_cap,
        )
    if kind == Keypoint.SIFT:
        from mapmerge_tpu.ops.keypoints.sift import detect_keypoints_sift

        return detect_keypoints_sift(
            cloud,
            min_scale=resolution,
            octaves=sift_octaves,
            scales_per_octave=sift_scales_per_octave,
            min_contrast=threshold,
            max_keypoints=max_keypoints,
            tile=tile,
            engine=engine,
            scan_cap=scan_cap,
        )
    raise ValueError(f"unknown keypoint type: {kind}")


__all__ = ["Keypoints", "detect_keypoints", "detect_keypoints_harris"]
