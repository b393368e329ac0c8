"""Pairwise transform estimation.

Equivalent of the reference's estimateTransform (src/matching.cpp:223-257):
method selection (MATCHING = reciprocal k-NN + RANSAC + SVD; SAC_IA =
sample-consensus initial alignment), optional ICP refinement, plus the
transformScore confidence. Operates on CloudFeatures pairs; fully jittable
and vmappable over a batch of pairs (the reference's sequential O(N^2) pair
loop, map_merging.cpp:256-269, becomes one batched call).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.core.enums import EstimationMethod
from mapmerge_tpu.core.params import MergeParams
from mapmerge_tpu.ops.matching import find_correspondences
from mapmerge_tpu.ops.ransac import ransac_transform
from mapmerge_tpu.ops.score import confidence as confidence_fn
from mapmerge_tpu.ops.score import transform_score
from mapmerge_tpu.pipeline.features import CloudFeatures


#: default ambiguity thresholds (PairEstimate.ambiguous): a registration is
#: flagged when under 25% of the source overlaps the target in range, when
#: under 60% of the competitive RANSAC hypotheses agree with the winning
#: pose (ops/ransac.py consensus_purity), or when the winning consensus
#: explains under 10% of the putative correspondences (accidental-inlier
#: wins on self-similar geometry)
AMBIGUITY_MIN_COVERAGE = 0.25
AMBIGUITY_MIN_PURITY = 0.6
AMBIGUITY_MIN_SUPPORT = 0.1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairEstimate:
    transform: jax.Array  # (4, 4) zeros on failure (map_merging.h:81-84)
    ok: jax.Array  # () bool
    confidence: jax.Array  # () float32 = 1/transformScore
    inlier_count: jax.Array  # () int32
    #: worst count of source query points the grid neighbor engine dropped
    #: at its query-side bucket cap during ICP/scoring — nonzero means some
    #: correspondences were silently unavailable; surfaced as a warning by
    #: estimate_maps_transforms (no silent caps)
    scan_overflow: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    #: fraction of valid source points whose NN in the target lands within
    #: max_correspondence_distance under the final transform (ops/score.py)
    #: — low coverage marks a low-overlap (ambiguity-prone) registration
    coverage: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.float32)
    )
    #: RANSAC consensus purity (ops/ransac.py): fraction of competitive
    #: hypotheses agreeing with the winning pose. Low purity = the
    #: correspondences support multiple distinct poses (e.g. translation
    #: sliding along a dominant plane). 1 for SAC_IA (no per-hypothesis
    #: pose bank is kept there) and for failed estimates.
    consensus_purity: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.ones((), jnp.float32)
    )
    #: inlier support: winning inlier count / putative correspondence
    #: count. A registration whose consensus explains only a sliver of the
    #: matches (self-similar geometry -> arbitrary matches -> accidental
    #: inliers) is structurally weak however well ICP then polishes it.
    #: 1 for SAC_IA and for failed estimates.
    support: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.ones((), jnp.float32)
    )

    def ambiguous(
        self,
        min_coverage: float = AMBIGUITY_MIN_COVERAGE,
        min_purity: float = AMBIGUITY_MIN_PURITY,
        min_support: float = AMBIGUITY_MIN_SUPPORT,
    ):
        """Ambiguity flag (VERDICT r4 weak 6): a successful registration
        whose evidence is structurally weak — the aligned overlap is a
        small fraction of the source (coverage), the RANSAC consensus
        splits over materially different poses (purity), or the winning
        consensus explains almost none of the matches (support). Works on
        scalars and on batched (pair-axis) estimates alike."""
        import jax.numpy as _jnp

        weak = (
            (self.coverage < min_coverage)
            | (self.consensus_purity < min_purity)
            | (self.support < min_support)
        )
        return self.ok & _jnp.asarray(weak)


def estimate_transform(
    source: CloudFeatures,
    target: CloudFeatures,
    params: MergeParams,
    key: jax.Array,
) -> PairEstimate:
    """Reference matching.cpp:223-257 with per-pair RNG key."""
    if params.estimation_method == EstimationMethod.MATCHING:
        corr = find_correspondences(
            source.descriptors.data,
            target.descriptors.data,
            k=params.matching_k,
            source_valid=source.descriptors.valid & source.keypoints.mask,
            target_valid=target.descriptors.valid & target.keypoints.mask,
        )
        res = ransac_transform(
            source.keypoints.xyz,
            target.keypoints.xyz,
            corr,
            inlier_threshold=params.inlier_threshold,
            num_hypotheses=params.ransac_hypotheses,
            key=key,
        )
        transform, ok, inliers = res.transform, res.ok, res.inlier_count
        purity = res.consensus_purity
        support = inliers / jnp.maximum(jnp.sum(corr.valid), 1)
    elif params.estimation_method == EstimationMethod.SAC_IA:
        from mapmerge_tpu.ops.sacia import sacia_transform

        purity = support = jnp.ones((), jnp.float32)
        transform, ok, inliers = sacia_transform(
            source.keypoints,
            source.descriptors,
            target.keypoints,
            target.descriptors,
            min_sample_distance=params.inlier_threshold,
            max_correspondence_distance=params.max_correspondence_distance,
            num_iterations=params.sacia_hypotheses,
            key=key,
        )
    else:
        raise ValueError(f"unknown estimation method: {params.estimation_method}")

    icp_overflow = jnp.zeros((), jnp.int32)
    if params.refine_transform:
        from mapmerge_tpu.ops.icp import icp_refine

        refined, icp_ok, icp_overflow = icp_refine(
            source.cloud,
            target.cloud,
            initial=transform,
            max_correspondence_distance=params.max_correspondence_distance,
            outlier_rejection_threshold=params.inlier_threshold,
            max_iterations=params.max_iterations,
            transform_epsilon=params.transform_epsilon,
            tile=params.neighbor_tile,
            anneal=params.icp_anneal,
            # coarse-to-fine floor: one registration voxel — a looser
            # floor lets wrong-surface correspondences bias the optimum
            # (2x resolution cost ~2.4deg on 50%-overlap strips)
            min_correspondence_distance=params.resolution,
            scan_cap=params.registration_scan_cap,
        )
        # the reference refines whatever the first stage produced, even a
        # failed (zero) transform (matching.cpp:250-253); ICP from a zero
        # guess cannot converge, so failure stays failure in practice —
        # we keep the explicit flag AND the zero-matrix convention
        transform = jnp.where(ok & icp_ok, refined, transform)

    transform = jnp.where(ok, transform, tf.zero())
    score, coverage, score_overflow = transform_score(
        source.cloud,
        target.cloud,
        transform,
        params.max_correspondence_distance,
        tile=params.neighbor_tile,
        scan_cap=params.registration_scan_cap,
    )
    if params.robust_confidence:
        # coverage^2/score exposes low-overlap false alignments; the
        # keypoint inlier count exposes floor-onto-floor ones (high
        # coverage, low score, but almost no keypoint agreement). The
        # product is the OpenCV-stitching-style weight the reference's
        # graph code was written for ("uses number of inliers as weights",
        # map_merging.cpp:163-165) fused with its actual 1/score metric.
        conf = confidence_fn(score, coverage) * jnp.maximum(inliers, 1)
    else:
        conf = confidence_fn(score)
    # failed pairs score a zero transform (all source points collapse to
    # the origin's bucket) — their overflow is an artifact of scoring a
    # non-answer, not a dropped correspondence; the zero matrix is already
    # the in-band failure signal, so gate the counter on ok
    overflow = jnp.where(
        ok, jnp.maximum(icp_overflow, score_overflow), jnp.int32(0)
    )
    return PairEstimate(
        transform=transform,
        ok=ok,
        confidence=conf,
        inlier_count=inliers,
        scan_overflow=overflow,
        coverage=jnp.where(ok, coverage, 0.0).astype(jnp.float32),
        consensus_purity=purity,
        support=jnp.where(ok, support, 1.0).astype(jnp.float32),
    )
