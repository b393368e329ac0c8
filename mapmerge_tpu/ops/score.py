"""Transform validation score.

TPU-native equivalent of pcl::registration::TransformationValidationEuclidean
as used by the reference (src/matching.cpp:259-268): mean squared
nearest-neighbor distance from the transformed source cloud to the target,
counting only pairs closer than `max_range`; returns a huge score when no
pair qualifies (PCL returns max double). Confidence = 1 / score
(map_merging.cpp:265-268).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.core.cloud import PointCloud
from mapmerge_tpu.ops.neighbors import nearest_neighbor

MAX_SCORE = 1.0e30


def transform_score(
    source: PointCloud,
    target: PointCloud,
    transform: jax.Array,
    max_range: float,
    tile: int = 1024,
) -> jax.Array:
    """Mean-square bounded NN distance (lower is better)."""
    moved = tf.apply(transform, source.xyz)
    _, d2 = nearest_neighbor(moved, target.xyz, p_mask=target.mask, tile=tile)
    within = source.mask & (d2 <= jnp.float32(max_range * max_range))
    num = jnp.sum(jnp.where(within, d2, 0.0))
    cnt = jnp.sum(within)
    return jnp.where(cnt > 0, num / jnp.maximum(cnt, 1), MAX_SCORE)


def confidence(score: jax.Array) -> jax.Array:
    return 1.0 / jnp.maximum(score, 1.0 / MAX_SCORE)
