"""Preprocessing kernels vs small numpy oracles.

Mirrors the reference's implicit contracts: VoxelGrid centroid semantics
(features.cpp:17-27), RadiusOutlierRemoval (features.cpp:31-43),
NormalEstimation PCA normals (features.cpp:168-179).
"""

import numpy as np
import pytest

from mapmerge_tpu.core.cloud import PointCloud
from mapmerge_tpu.ops.downsample import voxel_downsample
from mapmerge_tpu.ops.eigh3 import eigvalsh3, smallest_eigenpair3
from mapmerge_tpu.ops.neighbors import (
    nearest_neighbor,
    neighbor_moments,
    radius_count,
    radius_neighbors,
)
from mapmerge_tpu.ops.normals import compute_surface_normals
from mapmerge_tpu.ops.outliers import remove_outliers


def random_cloud(rng, n, cap=None, scale=1.0):
    xyz = (rng.random((n, 3)) * 2 - 1).astype(np.float32) * scale
    rgb = rng.random((n, 3)).astype(np.float32)
    return PointCloud.from_arrays(xyz, rgb, capacity=cap or n), xyz, rgb


class TestNeighbors:
    def test_radius_count_oracle(self, rng):
        pc, xyz, _ = random_cloud(rng, 200)
        r = 0.4
        counts = np.asarray(radius_count(pc.xyz, pc.xyz, r, pc.mask, tile=64)[0])
        d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
        oracle = (d <= r).sum(axis=1)
        np.testing.assert_array_equal(counts, oracle)

    def test_radius_count_masks_padding(self, rng):
        pc, xyz, _ = random_cloud(rng, 50, cap=128)
        counts = np.asarray(radius_count(pc.xyz, pc.xyz, 10.0, pc.mask, tile=64)[0])
        assert (counts[:50] == 50).all()

    def test_radius_neighbors_oracle(self, rng):
        pc, xyz, _ = random_cloud(rng, 100)
        r, k = 0.5, 12
        idx, d2, valid, _ = radius_neighbors(pc.xyz, pc.xyz, r, k, pc.mask, tile=32)
        idx, d2, valid = map(np.asarray, (idx, d2, valid))
        d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1) ** 2
        for q in range(100):
            order = np.argsort(d[q], kind="stable")
            within = [j for j in order if d[q, j] <= r * r][:k]
            got = idx[q][valid[q]]
            assert len(got) == len(within)
            # distances must match (ties may permute indices)
            np.testing.assert_allclose(
                np.sort(d[q, got]), np.sort(d[q, within]), atol=1e-5
            )

    def test_nearest_neighbor_oracle(self, rng):
        _, q_xyz, _ = random_cloud(rng, 64)
        pc_p, p_xyz, _ = random_cloud(rng, 200, cap=256)
        import jax.numpy as jnp

        idx, d2, _ = nearest_neighbor(jnp.asarray(q_xyz), pc_p.xyz, pc_p.mask, tile=32)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        d = np.linalg.norm(q_xyz[:, None] - p_xyz[None, :], axis=-1) ** 2
        oracle_idx = d.argmin(axis=1)
        np.testing.assert_array_equal(idx, oracle_idx)
        np.testing.assert_allclose(d2, d.min(axis=1), atol=1e-5)

    def test_neighbor_moments_oracle(self, rng):
        pc, xyz, _ = random_cloud(rng, 150)
        r = 0.6
        count, mean, cov, _ = neighbor_moments(pc.xyz, pc.xyz, r, pc.mask, tile=64)
        count, mean, cov = map(np.asarray, (count, mean, cov))
        d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
        for q in range(0, 150, 17):
            nbrs = xyz[d[q] <= r]
            assert count[q] == len(nbrs)
            np.testing.assert_allclose(mean[q], nbrs.mean(axis=0), atol=1e-5)
            c = np.cov(nbrs.T, bias=True) if len(nbrs) > 1 else np.zeros((3, 3))
            np.testing.assert_allclose(cov[q], c, atol=1e-5)


class TestEigh3:
    def test_eigvals_match_numpy(self, rng):
        a = rng.normal(size=(50, 3, 3)).astype(np.float32)
        sym = (a + a.transpose(0, 2, 1)) / 2
        lam = np.asarray(eigvalsh3(sym))
        oracle = np.linalg.eigvalsh(sym)
        np.testing.assert_allclose(lam, oracle, atol=1e-4)

    def test_smallest_eigenvector(self, rng):
        a = rng.normal(size=(50, 3, 3)).astype(np.float32)
        sym = (a + a.transpose(0, 2, 1)) / 2
        lam, vec, ok = smallest_eigenpair3(sym)
        lam, vec, ok = map(np.asarray, (lam, vec, ok))
        for i in range(50):
            if not ok[i]:
                continue
            # A v = lambda_min v
            res = sym[i] @ vec[i] - lam[i, 0] * vec[i]
            assert np.abs(res).max() < 1e-3

    def test_isotropic_flagged(self):
        a = np.stack([np.eye(3, dtype=np.float32)] * 4)
        _, _, ok = smallest_eigenpair3(a)
        assert not np.asarray(ok).any()


class TestDownsample:
    def test_centroids_oracle(self, rng):
        pc, xyz, rgb = random_cloud(rng, 300, cap=512, scale=2.0)
        res = 0.5
        out = voxel_downsample(pc, res)
        ox, orgb = out.to_arrays()
        # oracle: group by voxel key
        keys = np.floor(xyz / res).astype(np.int64)
        groups = {}
        for i, k in enumerate(map(tuple, keys)):
            groups.setdefault(k, []).append(i)
        assert len(ox) == len(groups)
        oracle = {
            k: (xyz[v].mean(axis=0), rgb[v].mean(axis=0)) for k, v in groups.items()
        }
        # every output centroid must match its voxel's oracle centroid
        # (match by nearest value; output order differs from dict order)
        for p, c in zip(ox, orgb):
            best = min(groups, key=lambda g: np.linalg.norm(oracle[g][0] - p))
            np.testing.assert_allclose(p, oracle[best][0], atol=1e-4)
            np.testing.assert_allclose(c, oracle[best][1], atol=1e-4)

    def test_idempotent_when_sparse(self, rng):
        # points further apart than resolution: nothing merges
        xyz = (np.arange(30)[:, None] * np.array([1.0, 0.0, 0.0])).astype(np.float32)
        pc = PointCloud.from_arrays(xyz, capacity=64)
        out = voxel_downsample(pc, 0.5)
        assert int(out.count) == 30

    def test_all_in_one_voxel(self, rng):
        xyz = rng.random((20, 3)).astype(np.float32) * 0.01
        pc = PointCloud.from_arrays(xyz)
        out = voxel_downsample(pc, 1.0)
        assert int(out.count) == 1
        ox, _ = out.to_arrays()
        np.testing.assert_allclose(ox[0], xyz.mean(axis=0), atol=1e-5)

    def test_empty_cloud(self):
        pc = PointCloud.from_arrays(np.zeros((0, 3)), capacity=8)
        out = voxel_downsample(pc, 0.1)
        assert int(out.count) == 0

    def test_out_capacity_truncates(self, rng):
        pc, _, _ = random_cloud(rng, 100, scale=10.0)
        out = voxel_downsample(pc, 0.01, out_capacity=10)
        assert out.capacity == 10
        assert int(out.count) == 10


class TestOutliers:
    def test_oracle(self, rng):
        pc, xyz, _ = random_cloud(rng, 120)
        r, m = 0.5, 10
        out = remove_outliers(pc, r, m, tile=64)
        d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
        oracle_keep = (d <= r).sum(axis=1) >= m
        np.testing.assert_array_equal(np.asarray(out.mask), oracle_keep)

    def test_isolated_point_dropped(self):
        xyz = np.concatenate(
            [np.random.default_rng(1).random((50, 3)).astype(np.float32) * 0.1,
             np.array([[100.0, 100.0, 100.0]], np.float32)]
        )
        pc = PointCloud.from_arrays(xyz)
        out = remove_outliers(pc, 0.5, 5)
        mask = np.asarray(out.mask)
        assert mask[:50].all() and not mask[50]


class TestNormals:
    def test_plane_normals(self, rng):
        # points on z=0 plane -> normals +-z, flipped towards origin viewpoint
        xy = (rng.random((200, 2)) * 2 - 1).astype(np.float32)
        xyz = np.concatenate([xy, np.zeros((200, 1), np.float32)], axis=1)
        # viewpoint at origin lies IN the plane; use an offset cloud instead
        xyz[:, 2] += 1.0  # plane z=1, viewpoint (0,0,0) below -> normals -z
        pc = PointCloud.from_arrays(xyz)
        res = compute_surface_normals(pc, radius=0.5)
        normals = np.asarray(res.normals)
        valid = np.asarray(res.valid)
        assert valid.mean() > 0.9
        np.testing.assert_allclose(
            normals[valid], np.tile([0, 0, -1.0], (valid.sum(), 1)), atol=1e-3
        )
        assert np.asarray(res.curvature)[valid].max() < 1e-4

    def test_sphere_normals_radial(self, rng):
        # points on a sphere of radius 5 centered at origin: normals radial,
        # flipped towards origin -> pointing inward (-p direction)
        v = rng.normal(size=(3000, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        xyz = v * 5.0
        pc = PointCloud.from_arrays(xyz)
        res = compute_surface_normals(pc, radius=1.0)
        normals = np.asarray(res.normals)
        valid = np.asarray(res.valid)
        assert valid.mean() > 0.9
        cos = np.sum(normals[valid] * (-v[valid]), axis=1)
        # sparse patches can be ill-conditioned; demand 95% well-aligned
        assert (cos > 0.95).mean() > 0.95

    def test_degenerate_too_few_neighbors(self):
        xyz = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float32)
        pc = PointCloud.from_arrays(xyz)
        res = compute_surface_normals(pc, radius=0.5)
        assert not np.asarray(res.valid).any()


class TestDownsampleStats:
    def test_no_overflow_zero_dropped(self, rng):
        from mapmerge_tpu.ops.downsample import voxel_downsample

        pts = rng.random((256, 3)).astype(np.float32) * 4.0
        pc = PointCloud.from_arrays(pts)
        out, dropped = voxel_downsample(pc, 0.1, with_stats=True)
        assert int(dropped) == 0

    def test_overflow_counts_dropped_points(self, rng):
        from mapmerge_tpu.ops.downsample import voxel_downsample

        # 200 points spread so each lands in its own voxel; capacity 50
        pts = (np.arange(200, dtype=np.float32)[:, None] * [1.0, 0.0, 0.0])
        pc = PointCloud.from_arrays(pts)
        out, dropped = voxel_downsample(pc, 0.5, out_capacity=50, with_stats=True)
        assert int(dropped) == 150
        assert int(out.count) == 50
