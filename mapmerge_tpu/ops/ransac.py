"""Batched-hypothesis RANSAC over correspondences.

TPU-native equivalent of pcl::registration::CorrespondenceRejectorSampleConsensus
+ TransformationEstimationSVD re-estimation (reference
src/matching.cpp:110-140). PCL iterates hypotheses sequentially with early
exit; here ALL hypotheses are drawn, solved (closed-form 3-point Kabsch,
ops/rigid.py) and scored in one vmapped program — argmax replaces the
sequential loop (SURVEY.md §2c "hypothesis parallel").

Failure is signalled exactly like the reference: a zero 4x4 and an empty
inlier set (matching.cpp:128-133 detects PCL's identity-transform sentinel;
we use an explicit ok flag plus the zero matrix in-band).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.ops.matching import Correspondences
from mapmerge_tpu.ops.rigid import kabsch

_NEG = -1.0e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RansacResult:
    transform: jax.Array  # (4, 4) float32; zeros when not ok
    inliers: jax.Array  # (S,) bool inlier mask over source slots
    inlier_count: jax.Array  # () int32
    ok: jax.Array  # () bool


def _sample_hypotheses(
    key: jax.Array, valid: jax.Array, num_hypotheses: int, sample_size: int = 3
) -> jax.Array:
    """(H, sample_size) indices of distinct valid correspondences.

    Gumbel top-k: per hypothesis take the top-`sample_size` of iid Gumbel
    noise restricted to valid slots — an exact uniform sample without
    replacement, fully parallel across hypotheses.
    """
    s = valid.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, s))
    g = jnp.where(valid[None, :], g, _NEG)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx.astype(jnp.int32)


def ransac_transform(
    source_kp: jax.Array,
    target_kp: jax.Array,
    corr: Correspondences,
    inlier_threshold: float,
    num_hypotheses: int,
    key: jax.Array,
) -> RansacResult:
    """Estimate T (source -> target) from putative correspondences.

    Reference contract (matching.cpp:110-140): RANSAC inlier selection at
    `inlier_threshold` euclidean distance, SVD re-estimation on the inlier
    set, zero matrix + empty inliers on failure.
    """
    src = source_kp[jnp.arange(corr.target.shape[0])]  # (S, 3) aligned slots
    dst = target_kp[corr.target]  # (S, 3) matched targets
    valid = corr.valid
    thr2 = jnp.float32(inlier_threshold * inlier_threshold)

    samples = _sample_hypotheses(key, valid, num_hypotheses)  # (H, 3)
    src_s = src[samples]  # (H, 3, 3)
    dst_s = dst[samples]
    # a sample is usable only if all three drawn slots were valid
    sample_ok = jnp.all(valid[samples], axis=-1)  # (H,)

    hyp_t, hyp_ok = kabsch(src_s, dst_s, jnp.ones(samples.shape, jnp.float32))
    hyp_ok = hyp_ok & sample_ok

    # score every hypothesis against every correspondence
    moved = tf.apply(hyp_t, src)  # (H, S, 3)
    resid2 = jnp.sum((moved - dst[None]) ** 2, axis=-1)  # (H, S)
    inlier_mat = (resid2 <= thr2) & valid[None, :]
    counts = jnp.sum(inlier_mat, axis=-1).astype(jnp.int32)  # (H,)
    counts = jnp.where(hyp_ok, counts, -1)

    best = jnp.argmax(counts)
    best_count = counts[best]
    best_inliers = inlier_mat[best]

    # SVD re-estimation on the winning inlier set (matching.cpp:135-137)
    refit_t, refit_ok = kabsch(src, dst, best_inliers.astype(jnp.float32))

    ok = (best_count >= 3) & refit_ok
    transform = jnp.where(ok, refit_t, tf.zero())
    inliers = best_inliers & ok
    return RansacResult(
        transform=transform,
        inliers=inliers,
        inlier_count=jnp.where(ok, jnp.sum(inliers), 0).astype(jnp.int32),
        ok=ok,
    )
