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
