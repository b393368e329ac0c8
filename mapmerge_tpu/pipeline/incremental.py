"""Incremental register-to-world mode for the online node.

The reference re-runs the FULL O(N^2) pairwise estimation on every
estimation tick (src/map_merge_node.cpp:141-142 -> map_merging.cpp:188-275)
— stateless and robust, but quadratic in robots and linear in ticks: a
50-robot stream pays ~1225 pairwise registrations per tick. This module is
the TPU-native incremental alternative the batched design makes cheap:

  - registered maps form a WORLD MODEL: their keypoint descriptors,
    concatenated in one fixed-capacity device array (one matmul matches a
    new map against EVERY registered map at once — the "descriptor
    matching as matmul" design, SURVEY §7, now across the whole world);
  - a new (or updated) map is localized by that one matmul: reciprocal
    correspondences vote for the best-supporting registered map, then the
    standard pairwise registration (RANSAC + ICP + score,
    pipeline/registration.py) runs against that single partner — one pair
    per new map instead of N-1;
  - failures stay in-band: a map that cannot be localized remains
    unregistered and is retried on the next tick with the then-richer
    world (elasticity semantics preserved: robots join any time).

Stateless full re-estimation remains the default node behavior
(reference parity); incremental mode is opt-in (MapMergeNode
incremental=True) and is what the 50-map streaming benchmark
(bench_configs.config5_big) measures. Quality is gated there: the
register-once chain accumulates drift exactly like the reference's MST
chaining, and the same pose-graph refinement (graph/pose_graph.py) can be
run over the accumulated edges at any time.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mapmerge_tpu.core.cloud import PointCloud, pad_cloud
from mapmerge_tpu.core.params import MergeParams
from mapmerge_tpu.ops.matching import find_correspondences
from mapmerge_tpu.pipeline.features import (
    STAGED_THRESHOLD,
    CloudFeatures,
    extract_features,
    extract_features_staged,
)
from mapmerge_tpu.pipeline.registration import estimate_transform


def features_for(cloud: PointCloud, params: MergeParams) -> CloudFeatures:
    """Feature extraction at a FIXED capacity (stable jit shapes across
    ticks), staged when the cloud is big (features.STAGED_THRESHOLD)."""
    cap = max(cloud.capacity, 1)
    if cap >= STAGED_THRESHOLD:
        return extract_features_staged(cloud, params)
    return _jit_extract(cloud, params)


@partial(jax.jit, static_argnames=("params",))
def _jit_extract(cloud, params):
    return extract_features(cloud, params)


@partial(jax.jit, static_argnames=("k", "m_max"))
def _vote(new_desc, new_valid, world_desc, world_valid, world_map_id, k, m_max):
    """One matmul against the whole world; votes per registered map."""
    corr = find_correspondences(
        new_desc, world_desc, k=k,
        source_valid=new_valid, target_valid=world_valid,
    )
    seg = world_map_id[corr.target]  # (S,)
    votes = jnp.zeros((m_max,), jnp.int32).at[seg].add(
        corr.valid.astype(jnp.int32), mode="drop"
    )
    return votes


@partial(jax.jit, static_argnames=("params",))
def _jit_pair(source, target, params, key):
    return estimate_transform(source, target, params, key)


@dataclasses.dataclass
class _Entry:
    name: str
    features: CloudFeatures
    pose: np.ndarray  # (4, 4) float32, map -> world


class WorldModel:
    """Device-resident registry of registered maps' descriptors + poses."""

    def __init__(self, params: MergeParams, max_maps: int = 64):
        self.params = params
        self.max_maps = max_maps
        self.entries: list[_Entry] = []
        self._by_name: dict[str, int] = {}
        # world descriptor block allocated lazily (descriptor dim is only
        # known once the first map's features arrive)
        self._k = params.max_keypoints
        self._world_desc = None
        self._world_valid = jnp.zeros((max_maps * self._k,), bool)
        self._world_map_id = jnp.zeros((max_maps * self._k,), jnp.int32)

    # ---- registry ----
    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def pose_of(self, name: str) -> np.ndarray:
        return self.entries[self._by_name[name]].pose

    @property
    def names(self) -> list[str]:
        return [e.name for e in self.entries]

    def add(self, name: str, features: CloudFeatures, pose: np.ndarray):
        """Insert or replace a registered map."""
        desc = features.descriptors.data
        valid = features.descriptors.valid & features.keypoints.mask
        if self._world_desc is None:
            self._world_desc = jnp.zeros(
                (self.max_maps * self._k, desc.shape[-1]), jnp.float32
            )
        if name in self._by_name:
            slot = self._by_name[name]
            self.entries[slot] = _Entry(name, features, np.asarray(pose))
        else:
            slot = len(self.entries)
            if slot >= self.max_maps:
                raise ValueError(
                    f"world model full ({self.max_maps} maps); raise max_maps"
                )
            self.entries.append(_Entry(name, features, np.asarray(pose)))
            self._by_name[name] = slot
        lo = slot * self._k
        self._world_desc = jax.lax.dynamic_update_slice(
            self._world_desc, desc.astype(jnp.float32), (lo, 0)
        )
        self._world_valid = jax.lax.dynamic_update_slice(
            self._world_valid, valid, (lo,)
        )
        self._world_map_id = jax.lax.dynamic_update_slice(
            self._world_map_id, jnp.full((self._k,), slot, jnp.int32), (lo,)
        )

    # ---- localization ----
    def localize(
        self,
        features: CloudFeatures,
        key: jax.Array,
        min_votes: int = 3,
    ):
        """Register a new map against the world.

        Returns (pose (4,4) np, confidence float, partner name) or None if
        the map cannot be localized yet (too few cross-votes or the pair
        registration failed — in-band failure, retried next tick)."""
        if not self.entries:
            return None
        votes = _vote(
            features.descriptors.data,
            features.descriptors.valid & features.keypoints.mask,
            self._world_desc, self._world_valid, self._world_map_id,
            self.params.matching_k, self.max_maps,
        )
        votes = np.asarray(votes)
        best = int(votes.argmax())
        if best >= len(self.entries) or votes[best] < min_votes:
            return None
        partner = self.entries[best]
        est = _jit_pair(features, partner.features, self.params, key)
        if not bool(np.asarray(est.ok)):
            return None
        rel = np.asarray(est.transform)
        pose = (partner.pose @ rel).astype(np.float32)
        return pose, float(np.asarray(est.confidence)), partner.name
