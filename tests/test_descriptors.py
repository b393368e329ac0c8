"""Descriptor kernels: invariances, normalization, pipeline integration.

Strategy: descriptors must be (a) well-formed (normalized, valid-masked),
(b) invariant under rigid motion of the whole scene, (c) discriminative
enough to register two views (pipeline smoke per descriptor type).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.core.cloud import PointCloud
from mapmerge_tpu.core.enums import DESCRIPTOR_DIMS, Descriptor
from mapmerge_tpu.ops.descriptors import compute_descriptors, descriptor_kind_from_dim
from mapmerge_tpu.ops.keypoints import detect_keypoints_harris
from mapmerge_tpu.ops.keypoints.harris import Keypoints
from mapmerge_tpu.ops.normals import compute_surface_normals
from mapmerge_tpu.pipeline.merging import estimate_maps_transforms

from synthetic import make_scene, overlapping_views, rotation_z, se3
from test_pipeline_e2e import small_params

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (<3 min gate)

IMPLEMENTED = [
    Descriptor.FPFH,
    Descriptor.PFH,
    Descriptor.PFHRGB,
    Descriptor.RSD,
    Descriptor.SHOT,
    Descriptor.SC3D,
]
# RSD is a 2-d radii descriptor: too coarse to uniquely match keypoints
MATCHABLE = [k for k in IMPLEMENTED if k != Descriptor.RSD]


@pytest.fixture(scope="module")
def featured_cloud():
    rng = np.random.default_rng(13)
    xyz, rgb = make_scene(rng, n_boxes=5, extent=6.0, density=50.0)
    pc = PointCloud.from_arrays(xyz, rgb)
    normals = compute_surface_normals(pc, radius=0.6, tile=512)
    kps = detect_keypoints_harris(
        pc, normals, threshold=5.0, radius=0.6, max_keypoints=64, tile=512
    )
    return pc, normals, kps


class TestWellFormed:
    @pytest.mark.parametrize("kind", IMPLEMENTED)
    def test_shape_and_validity(self, featured_cloud, kind):
        pc, normals, kps = featured_cloud
        desc = compute_descriptors(
            pc, normals, kps, kind, radius=0.8, max_neighbors=48, tile=512
        )
        assert desc.dim == DESCRIPTOR_DIMS[kind]
        assert int(desc.count) > 5
        data = np.asarray(desc.data)
        valid = np.asarray(desc.valid)
        assert np.isfinite(data).all()
        assert (data[~valid] == 0).all()

    @pytest.mark.parametrize("kind", IMPLEMENTED)
    def test_histogram_normalization(self, featured_cloud, kind):
        pc, normals, kps = featured_cloud
        desc = compute_descriptors(
            pc, normals, kps, kind, radius=0.8, max_neighbors=48, tile=512
        )
        data = np.asarray(desc.data)[np.asarray(desc.valid)]
        if kind == Descriptor.FPFH:
            sums = data.reshape(-1, 3, 11).sum(-1)
            np.testing.assert_allclose(sums, 100.0, atol=0.5)
        elif kind == Descriptor.PFH:
            np.testing.assert_allclose(data.sum(-1), 100.0, atol=0.5)
        elif kind == Descriptor.PFHRGB:
            np.testing.assert_allclose(data[:, :125].sum(-1), 100.0, atol=0.5)
            np.testing.assert_allclose(data[:, 125:].sum(-1), 100.0, atol=0.5)
        elif kind in (Descriptor.SHOT, Descriptor.SC3D):
            np.testing.assert_allclose(
                np.linalg.norm(data, axis=-1), 1.0, atol=1e-4
            )
        elif kind == Descriptor.RSD:
            assert (data >= 0).all() and (data[:, 0] <= data[:, 1] + 1e-6).all()

    def test_kind_from_dim(self):
        for kind, dim in DESCRIPTOR_DIMS.items():
            assert descriptor_kind_from_dim(dim) == kind


class TestRigidInvariance:
    @pytest.mark.parametrize("kind", MATCHABLE)
    def test_invariance(self, featured_cloud, kind):
        pc, normals, kps = featured_cloud
        desc = compute_descriptors(
            pc, normals, kps, kind, radius=0.8, max_neighbors=48, tile=512
        )
        t_np = se3(rotation_z(0.7), [2.0, -1.0, 0.5])
        t = jnp.asarray(t_np)
        pc2 = PointCloud(
            xyz=tf.apply(t, pc.xyz), rgb=pc.rgb, mask=pc.mask
        )
        # move the viewpoint with the scene so normal orientations are
        # preserved — isolates descriptor invariance from the (shared with
        # PCL) viewpoint-dependent normal flip
        normals2 = compute_surface_normals(
            pc2, radius=0.6, viewpoint=tuple(t_np[:3, 3]), tile=512
        )
        kps2 = Keypoints(
            xyz=tf.apply(t, kps.xyz), response=kps.response, mask=kps.mask
        )
        desc2 = compute_descriptors(
            pc2, normals2, kps2, kind, radius=0.8, max_neighbors=48, tile=512
        )
        a = np.asarray(desc.data)
        b = np.asarray(desc2.data)
        valid = np.asarray(desc.valid & desc2.valid)
        # Exact bitwise invariance is impossible: hard bin boundaries flip
        # under float perturbation and the fixed (0,0,0) viewpoint flips
        # some normals once the scene moves (PCL shares both properties).
        # What registration needs is self-NN consistency: each descriptor in
        # the moved scene must be nearest to its own twin.
        ai, bi = a[valid], b[valid]
        d2 = ((bi[:, None] - ai[None]) ** 2).sum(-1)
        hit = (d2.argmin(axis=1) == np.arange(len(bi))).mean()
        assert hit > 0.8, f"self-NN match rate {hit:.2f}"


class TestPipelinePerDescriptor:
    @pytest.mark.parametrize("kind", MATCHABLE)
    def test_merge_with_descriptor(self, kind):
        rng = np.random.default_rng(7)
        xyz, rgb = make_scene(rng, n_boxes=6, extent=8.0, density=60.0)
        truth = se3(rotation_z(0.4), [1.5, -0.7, 0.2])
        va, vb = overlapping_views(
            np.random.default_rng(3), xyz, rgb, truth, overlap=0.6
        )
        params = small_params(
            descriptor_type=kind, refine_transform=True, max_iterations=30
        )
        transforms = estimate_maps_transforms([va, vb], params, seed=0)
        rel = np.linalg.inv(transforms[0]) @ transforms[1]
        rot_err = float(tf.rotation_geodesic_deg(rel.astype(np.float32), truth))
        trans_err = float(np.linalg.norm(rel[:3, 3] - truth[:3, 3]))
        assert rot_err < 1.5, f"{kind}: rotation error {rot_err} deg"
        assert trans_err < 0.1, f"{kind}: translation error {trans_err} m"
