"""Online merge node tests (reference L4 semantics, map_merge_node.cpp)."""

import time

import numpy as np
import pytest

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.runtime.node import MapMergeNode
from mapmerge_tpu.runtime.transport import DirectoryTransport, InProcTransport

from synthetic import make_scene, overlapping_views, rotation_z, se3
from test_pipeline_e2e import small_params

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (<3 min gate)


@pytest.fixture(scope="module")
def two_robot_maps():
    rng = np.random.default_rng(7)
    xyz, rgb = make_scene(rng, n_boxes=12, extent=8.0, density=90.0)
    truth = se3(rotation_z(0.35), [1.2, -0.5, 0.15])
    va, vb = overlapping_views(
        np.random.default_rng(3), xyz, rgb, truth, overlap=0.7
    )
    ax, argb = va.to_arrays()
    bx, brgb = vb.to_arrays()
    return (ax, argb), (bx, brgb), truth


def node_params():
    return small_params(
        keypoint_type="SIFT",
        keypoint_threshold=3.0,
        refine_transform=True,
        max_iterations=60,
    )


class TestSynchronousJobs:
    """Drive the three jobs directly (no threads) — deterministic."""

    def test_discovery_estimation_compositing(self, two_robot_maps):
        (ax, argb), (bx, brgb), truth = two_robot_maps
        transport = InProcTransport()
        node = MapMergeNode(transport, params=node_params())

        # nothing yet
        node.discovery()
        assert node.get_robots() == []
        node.transforms_estimation()
        assert node.get_transforms() == {}

        # robots join at any time (map_merge_node.cpp:57-100)
        transport.publish("robot1", ax, argb)
        node.discovery()
        assert node.get_robots() == ["robot1"]
        node.transforms_estimation()
        t = node.get_transforms()
        np.testing.assert_array_equal(t["robot1"], np.eye(4))

        transport.publish("robot2", bx, brgb)
        node.discovery()
        node.transforms_estimation()
        t = node.get_transforms()
        assert set(t) == {"robot1", "robot2"}
        rel = np.linalg.inv(t["robot1"]) @ t["robot2"]
        rot_err = float(
            tf.rotation_geodesic_deg(rel.astype(np.float32), truth)
        )
        assert rot_err < 1.0

        node.map_compositing()
        merged = node.get_merged_map()
        assert merged is not None
        mx, _ = merged.to_arrays()
        assert len(mx) > 1000

    def test_compositing_uses_stale_transform_set(self, two_robot_maps):
        """clouds.resize semantics: compositing only uses maps known at the
        last estimation (map_merge_node.cpp:114-116)."""
        (ax, argb), (bx, brgb), _ = two_robot_maps
        transport = InProcTransport()
        node = MapMergeNode(transport, params=node_params())
        transport.publish("robot1", ax, argb)
        node.discovery()
        node.transforms_estimation()
        # a new robot appears AFTER estimation
        transport.publish("robot2", bx, brgb)
        node.discovery()
        node.map_compositing()
        merged = node.get_merged_map()
        mx, _ = merged.to_arrays()
        # only robot1's map composited (robot2 awaits next estimation)
        assert abs(len(mx) - len(ax) * 0.5) < len(ax)  # sanity: non-empty
        assert node.get_robots() == ["robot1", "robot2"]
        assert set(node.get_transforms()) == {"robot1"}

    def test_pose_callback(self, two_robot_maps):
        (ax, argb), _, _ = two_robot_maps
        poses = {}
        transport = InProcTransport()
        node = MapMergeNode(
            transport,
            params=node_params(),
            pose_callback=lambda r, t: poses.__setitem__(r, t),
        )
        transport.publish("robot1", ax, argb)
        node.discovery()
        node.transforms_estimation()
        assert "robot1" in poses
        np.testing.assert_array_equal(poses["robot1"], np.eye(4))


class TestThreadedNode:
    def test_periodic_loop(self, two_robot_maps):
        (ax, argb), (bx, brgb), truth = two_robot_maps
        transport = InProcTransport()
        transport.publish("robot1", ax, argb)
        transport.publish("robot2", bx, brgb)
        node = MapMergeNode(
            transport,
            params=node_params(),
            discovery_rate=20.0,
            estimation_rate=5.0,
            compositing_rate=5.0,
        )
        with node:
            deadline = time.time() + 120
            while time.time() < deadline:
                if node.get_merged_map() is not None and len(
                    node.get_transforms()
                ) == 2:
                    break
                time.sleep(0.25)
        t = node.get_transforms()
        assert set(t) == {"robot1", "robot2"}
        rel = np.linalg.inv(t["robot1"]) @ t["robot2"]
        assert float(tf.rotation_geodesic_deg(rel.astype(np.float32), truth)) < 1.0
        assert node.get_merged_map() is not None


class TestDirectoryTransport:
    def test_pcd_replay_fixture(self, tmp_path, two_robot_maps):
        """The from_pcds.launch analog (launch/from_pcds.launch:1-18)."""
        from mapmerge_tpu.io.pcd import write_pcd

        (ax, argb), (bx, brgb), _ = two_robot_maps
        write_pcd(tmp_path / "robot1.pcd", (ax, argb))
        transport = DirectoryTransport(str(tmp_path))
        assert transport.discover() == ["robot1"]
        v1, xyz, rgb = transport.latest("robot1")
        assert len(xyz) == len(ax)
        # second robot appears on disk later
        write_pcd(tmp_path / "robot2.pcd", (bx, brgb))
        assert transport.discover() == ["robot1", "robot2"]
        assert transport.latest("missing") is None


class TestCapacitySubsampling:
    """Over-capacity ingest must subsample uniformly and account for every
    dropped point — not head-truncate (VERDICT r1 item 4)."""

    def test_random_subsample_preserves_extent_and_counts(self, two_robot_maps):
        (ax, argb), (bx, brgb), truth = two_robot_maps
        cap = 2048
        transport = InProcTransport()
        node = MapMergeNode(
            transport, params=node_params().replace(max_points=cap), seed=0
        )
        # a cloud sorted along x: head-truncation would keep only low-x points
        order = np.argsort(ax[:, 0])
        transport.publish("robot_a", ax[order], argb[order])
        x, r, dropped = node._fit_to_capacity(ax[order], argb[order], cap, "robot_a")
        assert dropped == len(ax) - cap
        assert len(x) == cap
        # spatial coverage: the subsample must span (almost) the full extent
        assert x[:, 0].max() > ax[:, 0].max() - 0.5
        assert x[:, 0].min() < ax[:, 0].min() + 0.5
        # deterministic given (robot, seed)
        x2, _, _ = node._fit_to_capacity(ax[order], argb[order], cap, "robot_a")
        np.testing.assert_array_equal(x, x2)

    def test_estimation_tick_records_stats(self, two_robot_maps):
        (ax, argb), (bx, brgb), truth = two_robot_maps
        cap = 4096
        transport = InProcTransport()
        node = MapMergeNode(
            transport, params=node_params().replace(max_points=cap), seed=0
        )
        transport.publish("robot_a", ax, argb)
        transport.publish("robot_b", bx, brgb)
        node.discovery()
        node.transforms_estimation()
        stats = node.get_stats()
        expected = max(0, len(ax) - cap) + max(0, len(bx) - cap)
        assert stats["subsampled_points"] == expected
        assert len(node.get_transforms()) == 2
