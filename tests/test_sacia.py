"""SAC-IA estimation method tests (reference matching.cpp:142-194).

SAC-IA is a coarse initial aligner: with sparse keypoint sets it needs many
hypotheses (cheap in the batched design — params.sacia_hypotheses).
"""

import numpy as np
import pytest

from mapmerge_tpu.core import transforms as tf
from mapmerge_tpu.pipeline.merging import estimate_maps_transforms

from synthetic import make_scene, overlapping_views, rotation_z, se3
from test_pipeline_e2e import small_params

pytestmark = pytest.mark.slow  # deselect with -m 'not slow' (<3 min gate)


@pytest.fixture(scope="module")
def views():
    rng = np.random.default_rng(7)
    xyz, rgb = make_scene(rng, n_boxes=12, extent=8.0, density=90.0)
    truth = se3(rotation_z(0.35), [1.2, -0.5, 0.15])
    va, vb = overlapping_views(
        np.random.default_rng(3), xyz, rgb, truth, overlap=0.7
    )
    return va, vb, truth


class TestSacIA:
    def test_sacia_with_refine(self, views):
        va, vb, truth = views
        params = small_params(
            estimation_method="SAC_IA",
            refine_transform=True,
            max_iterations=60,
            sacia_hypotheses=4096,
        )
        transforms = estimate_maps_transforms([va, vb], params, seed=0)
        assert len(transforms) == 2
        rel = np.linalg.inv(transforms[0]) @ transforms[1]
        rot_err = float(tf.rotation_geodesic_deg(rel.astype(np.float32), truth))
        trans_err = float(np.linalg.norm(rel[:3, 3] - truth[:3, 3]))
        assert rot_err < 2.0, f"rotation error {rot_err} deg"
        assert trans_err < 0.15, f"translation error {trans_err} m"

    def test_sacia_coarse_only(self, views):
        va, vb, truth = views
        params = small_params(
            estimation_method="SAC_IA",
            refine_transform=False,
            sacia_hypotheses=4096,
        )
        transforms = estimate_maps_transforms([va, vb], params, seed=0)
        rel = np.linalg.inv(transforms[0]) @ transforms[1]
        rot_err = float(tf.rotation_geodesic_deg(rel.astype(np.float32), truth))
        trans_err = float(np.linalg.norm(rel[:3, 3] - truth[:3, 3]))
        assert rot_err < 15.0, f"rotation error {rot_err} deg"
        assert trans_err < 1.0, f"translation error {trans_err} m"
