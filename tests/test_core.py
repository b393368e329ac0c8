"""Core array model, params, transforms, and PCD I/O tests."""

import dataclasses

import numpy as np
import pytest

from mapmerge_tpu.core.cloud import FAR, PointCloud, pad_cloud, stack_clouds
from mapmerge_tpu.core.enums import Descriptor, EstimationMethod, Keypoint, from_string
from mapmerge_tpu.core.params import MergeParams
from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.io.pcd import read_pcd, read_pcd_arrays, write_pcd


class TestParams:
    def test_defaults_match_reference(self):
        # reference map_merging.h:29-44
        p = MergeParams()
        assert p.resolution == 0.1
        assert p.descriptor_radius == pytest.approx(0.8)
        assert p.outliers_min_neighbours == 50
        assert p.normal_radius == pytest.approx(0.6)
        assert p.keypoint_type == Keypoint.SIFT
        assert p.keypoint_threshold == 5.0
        assert p.descriptor_type == Descriptor.PFH
        assert p.estimation_method == EstimationMethod.MATCHING
        assert p.refine_transform is True
        assert p.inlier_threshold == pytest.approx(0.5)
        assert p.max_correspondence_distance == pytest.approx(1.0)
        assert p.max_iterations == 500
        assert p.matching_k == 5
        assert p.transform_epsilon == 1e-2
        assert p.confidence_threshold == 0.0
        assert p.output_resolution == 0.05

    def test_no_rederivation_on_override(self):
        # reference semantics: overriding resolution does NOT re-derive radii
        # (map_merging.cpp:10-98 parses independently)
        p = MergeParams(resolution=0.5)
        assert p.descriptor_radius == pytest.approx(0.8)
        assert p.inlier_threshold == pytest.approx(0.5)

    def test_derived_constructor(self):
        p = MergeParams.derived(resolution=0.2)
        assert p.descriptor_radius == pytest.approx(1.6)
        assert p.normal_radius == pytest.approx(1.2)
        assert p.inlier_threshold == pytest.approx(1.0)
        assert p.max_correspondence_distance == pytest.approx(2.0)

    def test_command_line_parsing(self):
        p = MergeParams.from_command_line(
            [
                "--resolution", "0.25",
                "--keypoint_type", "HARRIS",
                "--descriptor_type", "FPFH",
                "--estimation_method", "SAC_IA",
                "--refine_transform", "false",
                "--matching_k", "0",
                "--max_iterations", "100",
            ]
        )
        assert p.resolution == 0.25
        assert p.keypoint_type == Keypoint.HARRIS
        assert p.descriptor_type == Descriptor.FPFH
        assert p.estimation_method == EstimationMethod.SAC_IA
        assert p.refine_transform is False
        assert p.matching_k == 5  # non-positive ignored (map_merging.cpp:44-47)
        assert p.max_iterations == 100

    def test_from_dict(self):
        p = MergeParams.from_dict({"resolution": 0.3, "unknown_key": 1})
        assert p.resolution == 0.3

    def test_hashable_static(self):
        assert hash(MergeParams()) == hash(MergeParams())
        assert MergeParams() == MergeParams()

    def test_string_coercion(self):
        p = MergeParams(keypoint_type="HARRIS", descriptor_type="FPFH")
        assert p.keypoint_type is Keypoint.HARRIS
        assert p.descriptor_type is Descriptor.FPFH

    def test_enum_from_string_invalid(self):
        with pytest.raises(ValueError):
            from_string(Keypoint, "NOPE")

    def test_str_lists_all_fields(self):
        s = str(MergeParams())
        for f in dataclasses.fields(MergeParams):
            assert f.name in s


class TestCloud:
    def test_padding_and_mask(self):
        pc = PointCloud.from_arrays(np.zeros((5, 3)), capacity=8)
        assert pc.capacity == 8
        assert int(pc.count) == 5
        assert np.all(np.asarray(pc.xyz)[5:] == FAR)

    def test_roundtrip_arrays(self, rng):
        xyz = rng.normal(size=(7, 3)).astype(np.float32)
        rgb = rng.uniform(size=(7, 3)).astype(np.float32)
        pc = PointCloud.from_arrays(xyz, rgb, capacity=10)
        x2, r2 = pc.to_arrays()
        np.testing.assert_allclose(x2, xyz, rtol=1e-6)
        np.testing.assert_allclose(r2, rgb, rtol=1e-6)

    def test_stack_clouds(self, rng):
        a = PointCloud.from_arrays(rng.normal(size=(4, 3)))
        b = PointCloud.from_arrays(rng.normal(size=(9, 3)))
        batch = stack_clouds([a, b])
        assert batch.xyz.shape == (2, 9, 3)
        assert np.asarray(batch.count).tolist() == [4, 9]

    def test_capacity_too_small(self):
        with pytest.raises(ValueError):
            PointCloud.from_arrays(np.zeros((5, 3)), capacity=3)
        with pytest.raises(ValueError):
            pad_cloud(PointCloud.from_arrays(np.zeros((5, 3))), 3)

    def test_pytree(self):
        import jax

        pc = PointCloud.from_arrays(np.zeros((5, 3)))
        leaves = jax.tree_util.tree_leaves(pc)
        assert len(leaves) == 3


class TestTransforms:
    def test_rigid_inverse(self, rng):
        angle = 0.7
        r = np.array(
            [
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
        t = tf.from_rotation_translation(r, np.array([1.0, 2.0, 3.0], np.float32))
        inv = tf.rigid_inverse(t)
        np.testing.assert_allclose(
            np.asarray(tf.compose(t, inv)), np.eye(4), atol=1e-6
        )

    def test_apply(self, rng):
        t = tf.from_rotation_translation(
            np.eye(3, dtype=np.float32), np.array([1.0, 0.0, 0.0], np.float32)
        )
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        out = np.asarray(tf.apply(t, pts))
        np.testing.assert_allclose(out, pts + np.array([1, 0, 0]), atol=1e-6)

    def test_zero_semantics(self):
        assert bool(tf.is_zero(tf.zero()))
        assert not bool(tf.is_zero(tf.identity()))

    def test_rotation_metrics(self):
        a = tf.identity()
        angle = np.pi / 2
        r = np.array(
            [
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
        b = tf.from_rotation_translation(r, np.zeros(3, np.float32))
        assert float(tf.rotation_geodesic_deg(a, b)) == pytest.approx(90.0, abs=1e-3)


class TestPCD:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, rng, binary):
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        rgb = rng.uniform(size=(100, 3)).astype(np.float32)
        path = tmp_path / "t.pcd"
        write_pcd(path, (xyz, rgb), binary=binary)
        x2, r2 = read_pcd_arrays(path)
        np.testing.assert_allclose(x2, xyz, atol=1e-5)
        np.testing.assert_allclose(r2, rgb, atol=1.0 / 255.0)

    def test_read_into_cloud(self, tmp_path, rng):
        xyz = rng.normal(size=(10, 3)).astype(np.float32)
        path = tmp_path / "t.pcd"
        write_pcd(path, (xyz, None))
        pc = read_pcd(path, capacity=16)
        assert pc.capacity == 16
        assert int(pc.count) == 10
