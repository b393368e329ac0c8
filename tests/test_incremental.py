"""Incremental register-to-world node mode (pipeline/incremental.py).

The default node re-estimates everything per tick (reference semantics,
map_merge_node.cpp:141-142); incremental mode localizes only new/updated
maps against the world model. These tests pin: correctness of the
localized poses against ground truth, feature caching across ticks,
in-band failure for unlocalizable maps, and elastic retry on later ticks.
"""

import numpy as np
import pytest

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.core.params import MergeParams
from mapmerge_tpu.runtime.node import MapMergeNode
from mapmerge_tpu.runtime.transport import InProcTransport

from synthetic import make_town, n_overlapping_views, rotation_z, se3

pytestmark = pytest.mark.slow


def _views(n_maps=6, target=4000, seed=11):
    rng = np.random.default_rng(seed)
    xyz, rgb = make_town(rng, int(target / 0.8))
    truths = [
        np.eye(4, dtype=np.float32)
        if i == 0
        else se3(
            rotation_z(0.15 * ((i % 7) - 3)),
            [0.6 * (i % 5), -0.3 * (i % 4), 0.04 * (i % 3)],
        )
        for i in range(n_maps)
    ]
    return n_overlapping_views(rng, xyz, rgb, truths, keep=0.8), truths


def _params():
    # SIFT on the color town, like the config5 stream bench: Harris finds
    # too few repeatable corners on directional crops for reliable
    # cross-view voting
    return MergeParams(
        keypoint_type="SIFT", keypoint_threshold=3.0,
        descriptor_type="FPFH", refine_transform=True, max_iterations=30,
        max_points=16384, max_keypoints=128, max_neighbors=32,
        ransac_hypotheses=512, neighbor_tile=256,
    )


class TestIncrementalNode:
    def test_streamed_join_poses_match_truth(self):
        views, truths = _views()
        transport = InProcTransport()
        node = MapMergeNode(
            transport, params=_params(), seed=0, incremental=True
        )
        # two batches of robots joining over time
        for batch in (range(0, 3), range(3, 6)):
            for i in batch:
                transport.publish(f"r{i}", views[i][0], views[i][1])
            node.discovery()
            node.transforms_estimation()
        poses = node.get_transforms()
        assert len(poses) == 6
        assert all(t.any() for t in poses.values()), {
            k: bool(v.any()) for k, v in poses.items()
        }
        # world frame = robot r0 (seeded identity); compare relative poses
        base = poses["r0"]
        for i in range(1, 6):
            rel = np.linalg.inv(base) @ poses[f"r{i}"]
            grel = np.linalg.inv(truths[0]) @ truths[i]
            rot = float(
                tf.rotation_geodesic_deg(
                    rel.astype(np.float32), grel.astype(np.float32)
                )
            )
            trans = float(np.linalg.norm(rel[:3, 3] - grel[:3, 3]))
            assert rot < 3.0, f"r{i}: rot {rot}"
            assert trans < 0.25, f"r{i}: trans {trans}"
        # compositing consumes the incremental poses
        node.map_compositing()
        merged = node.get_merged_map()
        assert merged is not None and int(np.asarray(merged.mask).sum()) > 500

    def test_features_cached_per_map_version(self):
        views, _ = _views(n_maps=3)
        transport = InProcTransport()
        node = MapMergeNode(
            transport, params=_params(), seed=0, incremental=True
        )
        for i in range(3):
            transport.publish(f"r{i}", views[i][0], views[i][1])
        node.discovery()
        node.transforms_estimation()
        stamps1 = {r: s for r, (s, _) in node._feat_cache.items()}
        node.transforms_estimation()  # no map changed: no re-extraction
        stamps2 = {r: s for r, (s, _) in node._feat_cache.items()}
        assert stamps1 == stamps2
        # republish one robot's map -> only that one re-extracts
        transport.publish("r1", views[1][0], views[1][1])
        node.transforms_estimation()
        stamps3 = {r: s for r, (s, _) in node._feat_cache.items()}
        assert stamps3["r0"] == stamps2["r0"]
        assert stamps3["r1"] != stamps2["r1"]

    def test_unlocalizable_map_fails_in_band_then_retries(self):
        views, _ = _views(n_maps=3)
        transport = InProcTransport()
        node = MapMergeNode(
            transport, params=_params(), seed=0, incremental=True
        )
        # a far-away unrelated blob cannot register against the town
        rng = np.random.default_rng(0)
        blob = (rng.random((800, 3)).astype(np.float32) - 0.5) + np.array(
            [500.0, 500.0, 0.0], np.float32
        )
        transport.publish("r0", views[0][0], views[0][1])
        transport.publish("lost", blob, None)
        node.discovery()
        node.transforms_estimation()
        poses = node.get_transforms()
        assert poses["r0"].any()
        assert not poses["lost"].any()  # zero matrix, in-band
        # the rest of the town arrives; 'lost' stays failed, others join
        for i in (1, 2):
            transport.publish(f"r{i}", views[i][0], views[i][1])
        node.discovery()
        node.transforms_estimation()
        poses = node.get_transforms()
        assert sum(1 for t in poses.values() if t.any()) == 3
        assert not poses["lost"].any()


class TestWorldModelLoopClosure:
    """The stream's pose graph (VERDICT r4 missing 3): every localization
    stores a TransformEstimate edge in the WorldModel, and refine() runs
    the SE(3) pose-graph relaxation over the accumulated set — so a
    drifted register-once chain is CORRECTED by a closing edge, not
    merely bounded by pairwise quality."""

    @staticmethod
    def _world_with(poses, edges):
        from mapmerge_tpu.pipeline.incremental import WorldModel, _Entry

        w = WorldModel(MergeParams(), max_maps=16)
        for i, p in enumerate(poses):
            w.entries.append(_Entry(f"m{i}", None, np.asarray(p, np.float32)))
            w._by_name[f"m{i}"] = i
        w.edges = list(edges)
        return w

    def test_drifted_chain_corrected_by_closing_edge(self):
        from mapmerge_tpu.graph.merge_graph import TransformEstimate

        n = 6
        truths = [
            se3(rotation_z(0.15 * i), [1.0 * i, 0.2 * i, 0.0])
            for i in range(n)
        ]
        # noisy chain measurements: each hop 1.5 deg off -> ~7.5 deg
        # accumulated at the chain end
        hop_noise = rotation_z(np.radians(1.5))
        edges = []
        seed_poses = [np.eye(4, dtype=np.float32)]
        for i in range(1, n):
            rel_true = np.linalg.inv(truths[i - 1]) @ truths[i]
            rel_noisy = (rel_true @ se3(hop_noise, [0, 0, 0])).astype(
                np.float32
            )
            edges.append(
                TransformEstimate(
                    source_idx=i, target_idx=i - 1,
                    transform=rel_noisy, confidence=10.0,
                )
            )
            seed_poses.append(
                (seed_poses[-1] @ rel_noisy).astype(np.float32)
            )
        # the register-once chain has drifted:
        drift_before = float(
            tf.rotation_geodesic_deg(
                seed_poses[-1].astype(np.float32),
                (np.linalg.inv(truths[0]) @ truths[-1]).astype(np.float32),
            )
        )
        assert drift_before > 5.0, drift_before
        # exact loop-closure edge: last map also registered against m0
        # (the top-2-partner redundant edge localize() produces)
        closing = TransformEstimate(
            source_idx=n - 1, target_idx=0,
            transform=(np.linalg.inv(truths[0]) @ truths[-1]).astype(
                np.float32
            ),
            confidence=10.0,
        )
        w = self._world_with(seed_poses, edges + [closing])
        assert w.refine() is True
        pose_end = w.entries[-1].pose
        drift_after = float(
            tf.rotation_geodesic_deg(
                pose_end.astype(np.float32),
                (np.linalg.inv(truths[0]) @ truths[-1]).astype(np.float32),
            )
        )
        assert drift_after < drift_before / 2.0, (drift_before, drift_after)
        assert drift_after < 2.0, drift_after

    def test_refine_needs_redundancy(self):
        """A bare chain (tree) has nothing to relax: refine() declines."""
        from mapmerge_tpu.graph.merge_graph import TransformEstimate

        poses = [
            se3(rotation_z(0.1 * i), [float(i), 0, 0]) for i in range(4)
        ]
        edges = [
            TransformEstimate(
                source_idx=i, target_idx=i - 1,
                transform=(
                    np.linalg.inv(poses[i - 1]) @ poses[i]
                ).astype(np.float32),
                confidence=5.0,
            )
            for i in range(1, 4)
        ]
        w = self._world_with(poses, edges)
        assert w.refine() is False

    def test_replaced_map_drops_stale_edges(self):
        """An updated map's old edges measured old geometry: add() with an
        existing name must drop edges touching that slot."""
        from mapmerge_tpu.graph.merge_graph import TransformEstimate

        views, _ = _views(n_maps=2, target=1500)
        cap = 8192
        from mapmerge_tpu.pipeline.incremental import WorldModel, features_for
        from mapmerge_tpu.core.cloud import PointCloud

        params = _params()
        w = WorldModel(params, max_maps=4)

        f0 = features_for(
            PointCloud.from_arrays(*views[0], capacity=cap), params
        )
        f1 = features_for(
            PointCloud.from_arrays(*views[1], capacity=cap), params
        )
        w.add("a", f0, np.eye(4, dtype=np.float32))
        w.add("b", f1, np.eye(4, dtype=np.float32))
        w.edges.append(
            TransformEstimate(
                source_idx=1, target_idx=0,
                transform=np.eye(4, dtype=np.float32), confidence=1.0,
            )
        )
        w.add("b", f1, np.eye(4, dtype=np.float32))  # replace
        assert w.edges == []
