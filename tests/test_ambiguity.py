"""Ambiguous-registration detection (VERDICT r4 weak 6).

A floor-dominated pair can ace the reference's 1/score confidence while
its pose is unconstrained along the plane (translation slides freely).
PairEstimate.ambiguous flags such registrations at registration time from
two already-computed signals: score coverage (ops/score.py) and RANSAC
consensus purity (ops/ransac.py — the fraction of competitive hypotheses
agreeing with the winning pose, free in the batched-hypothesis design
where PCL's sequential early-exit loop could never see it).
"""

import numpy as np
import pytest

from mapmerge_tpu.core.cloud import PointCloud
from mapmerge_tpu.core.params import MergeParams
from mapmerge_tpu.pipeline.features import extract_features
from mapmerge_tpu.pipeline.registration import estimate_transform

from synthetic import make_scene, overlapping_views, rotation_z, se3


def _params(**kw):
    base = dict(
        keypoint_type="SIFT", keypoint_threshold=2.0,
        descriptor_type="FPFH", refine_transform=True, max_iterations=20,
        max_points=8192, max_keypoints=256, max_neighbors=32,
        ransac_hypotheses=512, neighbor_tile=256,
    )
    base.update(kw)
    return MergeParams(**base)


def _estimate(xa, ra, xb, rb, params, seed=0):
    import jax

    jit_pair = jax.jit(estimate_transform, static_argnames=("params",))
    cap = 1 << int(np.ceil(np.log2(max(len(xa), len(xb)))))
    fa = extract_features(
        PointCloud.from_arrays(xa, ra, capacity=cap), params
    )
    fb = extract_features(
        PointCloud.from_arrays(xb, rb, capacity=cap), params
    )
    return jit_pair(fa, fb, params, jax.random.key(seed))


class TestAmbiguityFlag:
    def test_floor_dominated_pair_is_flagged(self):
        """Two views of a bare noisy floor: planar geometry constrains
        nothing along the plane, so RANSAC's competitive hypotheses split
        across slides — purity collapses and the estimate is flagged,
        even though the 1/score confidence of floor-onto-floor is high."""
        rng = np.random.default_rng(5)
        n = 4000
        xy = (rng.random((n, 2)).astype(np.float32) - 0.5) * 12.0
        z = rng.normal(0, 0.01, n).astype(np.float32)
        xyz = np.column_stack([xy, z])
        rgb = rng.random((n, 3)).astype(np.float32)  # speckle for SIFT
        # second view: an INDEPENDENTLY sampled patch of the same kind of
        # floor (different points, different speckle) — descriptors are
        # all floor-alike, so matches are essentially arbitrary and any
        # slide along the plane is as good as any other
        xy_b = (rng.random((n, 2)).astype(np.float32) - 0.5) * 12.0
        z_b = rng.normal(0, 0.01, n).astype(np.float32)
        xyz_b = np.column_stack([xy_b, z_b])
        rgb_b = rng.random((n, 3)).astype(np.float32)
        est = _estimate(xyz, rgb, xyz_b, rgb_b, _params())
        if not bool(np.asarray(est.ok)):
            pytest.skip("floor pair did not register at all (also safe)")
        amb = bool(np.asarray(est.ambiguous()))
        purity = float(np.asarray(est.consensus_purity))
        assert amb, (
            f"floor-dominated registration not flagged: purity {purity}, "
            f"coverage {float(np.asarray(est.coverage))}"
        )

    def test_well_constrained_pair_not_flagged(self):
        """A structured scene with good overlap must NOT be flagged: its
        competitive hypotheses cluster on the true pose."""
        rng = np.random.default_rng(3)
        xyz, rgb = make_scene(rng, n_boxes=14, extent=10.0, density=60.0)
        truth = se3(rotation_z(0.3), [1.0, -0.4, 0.1])
        va, vb = overlapping_views(
            np.random.default_rng(1), xyz, rgb, truth, overlap=0.7
        )
        est = _estimate(
            np.asarray(va.xyz[np.asarray(va.mask)]),
            np.asarray(va.rgb[np.asarray(va.mask)]),
            np.asarray(vb.xyz[np.asarray(vb.mask)]),
            np.asarray(vb.rgb[np.asarray(vb.mask)]),
            _params(),
        )
        assert bool(np.asarray(est.ok))
        assert not bool(np.asarray(est.ambiguous())), (
            f"good pair wrongly flagged: purity "
            f"{float(np.asarray(est.consensus_purity))}, coverage "
            f"{float(np.asarray(est.coverage))}"
        )
