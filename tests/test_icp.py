"""ICP refinement tests (reference matching.cpp:196-221 contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.core.cloud import PointCloud
from mapmerge_tpu.ops.icp import icp_refine

from synthetic import make_scene, rotation_z, se3


@pytest.fixture(scope="module")
def scene_cloud():
    rng = np.random.default_rng(11)
    xyz, rgb = make_scene(rng, n_boxes=4, extent=6.0, density=40.0)
    return PointCloud.from_arrays(xyz, rgb)


class TestICP:
    def test_refines_perturbed_guess(self, scene_cloud):
        truth = se3(rotation_z(0.3), [0.8, -0.4, 0.1])
        moved = PointCloud(
            xyz=tf.apply(jnp.asarray(truth), scene_cloud.xyz),
            rgb=scene_cloud.rgb,
            mask=scene_cloud.mask,
        )
        # start from a perturbed guess
        guess = se3(rotation_z(0.3 + 0.05), [0.7, -0.3, 0.15])
        refined, ok, _ = icp_refine(
            scene_cloud, moved, jnp.asarray(guess),
            max_correspondence_distance=1.0,
            outlier_rejection_threshold=0.5,
            max_iterations=50,
            transform_epsilon=1e-4,
            tile=512,
        )
        assert bool(ok)
        rot_err = float(tf.rotation_geodesic_deg(refined, jnp.asarray(truth)))
        tr_err = float(tf.translation_error(refined, jnp.asarray(truth)))
        # better than the guess, close to truth
        assert rot_err < 0.5
        assert tr_err < 0.05

    def test_zero_guess_fails(self, scene_cloud):
        refined, ok, _ = icp_refine(
            scene_cloud, scene_cloud, tf.zero(),
            max_correspondence_distance=0.5,
            outlier_rejection_threshold=0.25,
            max_iterations=10,
            transform_epsilon=1e-2,
            tile=512,
        )
        assert not bool(ok)

    def test_identity_stays_identity(self, scene_cloud):
        refined, ok, _ = icp_refine(
            scene_cloud, scene_cloud, tf.identity(),
            max_correspondence_distance=1.0,
            outlier_rejection_threshold=0.5,
            max_iterations=20,
            transform_epsilon=1e-4,
            tile=512,
        )
        assert bool(ok)
        assert float(tf.rotation_geodesic_deg(refined, tf.identity())) < 0.05
        assert float(tf.translation_error(refined, tf.identity())) < 1e-3
