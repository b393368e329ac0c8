"""Per-cloud feature stage.

Equivalent of the reference's four sequential per-cloud loops in
estimateMapsTransforms (map_merge_3d/src/map_merging.cpp:211-242):
downsample -> outlier removal -> normals -> keypoints -> descriptors,
with the same parameter plumbing (keypoint radius = normal_radius,
SIFT min_scale = resolution, descriptor radius = descriptor_radius).
One jittable function over a single padded cloud — vmap it over the batch
axis for the N-cloud stage (the reference loops; we fan out).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax

from mapmerge_tpu.core.cloud import PointCloud
from mapmerge_tpu.core.params import MergeParams
from mapmerge_tpu.ops.descriptors import Descriptors, compute_descriptors
from mapmerge_tpu.ops.downsample import voxel_downsample
from mapmerge_tpu.ops.keypoints import Keypoints, detect_keypoints
from mapmerge_tpu.ops.normals import SurfaceNormals, compute_surface_normals
from mapmerge_tpu.ops.outliers import remove_outliers


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CloudFeatures:
    """Everything the pairwise stage needs about one cloud."""

    cloud: PointCloud  # registration-resolution cloud (padded, masked)
    normals: SurfaceNormals
    keypoints: Keypoints
    descriptors: Descriptors


@partial(jax.jit, static_argnames=("params",))
def extract_features(cloud: PointCloud, params: MergeParams) -> CloudFeatures:
    """Reference stage order map_merging.cpp:211-242."""
    resized = voxel_downsample(
        cloud,
        params.resolution,
        # a voxel grid never grows the cloud; don't pad past the input
        out_capacity=min(cloud.capacity, params.max_points),
    )
    resized = remove_outliers(
        resized,
        params.descriptor_radius,
        params.outliers_min_neighbours,
        tile=params.neighbor_tile,
    )
    normals = compute_surface_normals(
        resized, params.normal_radius, tile=params.neighbor_tile
    )
    keypoints = detect_keypoints(
        resized,
        normals,
        params.keypoint_type,
        threshold=params.keypoint_threshold,
        radius=params.normal_radius,  # map_merging.cpp:233
        resolution=params.resolution,
        max_keypoints=params.max_keypoints,
        tile=params.neighbor_tile,
        sift_octaves=params.sift_octaves,
        sift_scales_per_octave=params.sift_scales_per_octave,
    )
    descriptors = compute_descriptors(
        resized,
        normals,
        keypoints,
        params.descriptor_type,
        params.descriptor_radius,
        max_neighbors=params.max_neighbors,
        tile=params.neighbor_tile,
    )
    # the reference drops keypoints whose descriptors are invalid
    # (features.cpp:118-141); masks keep the arrays aligned here
    keypoints = dataclasses.replace(
        keypoints, mask=keypoints.mask & descriptors.valid
    )
    return CloudFeatures(
        cloud=resized,
        normals=normals,
        keypoints=keypoints,
        descriptors=descriptors,
    )
