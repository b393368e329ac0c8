"""Parity tests for the fused Pallas TPU kernels (interpreter mode on CPU).

The compiled kernels run only on TPU hardware (ops/neighbors dispatches on
backend); here the same kernel bodies run through the Pallas interpreter
and are checked against the tiled XLA path and a numpy oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mapmerge_tpu.ops.neighbors import nearest_neighbor
from mapmerge_tpu.pallas.nn import nearest_neighbor_pallas


def _oracle(q, p, mask=None):
    d = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    if mask is not None:
        d[:, ~mask] = np.inf
    return d.argmin(1).astype(np.int32), d.min(1)


class TestPallasNN:
    def test_unmasked_parity(self, rng):
        q = (rng.random((300, 3)) * 10).astype(np.float32)
        p = (rng.random((1000, 3)) * 10).astype(np.float32)
        idx, d2 = nearest_neighbor_pallas(
            jnp.asarray(q), jnp.asarray(p), interpret=True
        )
        ref_idx, ref_d2 = _oracle(q, p)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-5, atol=1e-6)

    def test_masked_parity(self, rng):
        q = (rng.random((257, 3)) * 10).astype(np.float32)
        p = (rng.random((3001, 3)) * 10).astype(np.float32)
        mask = rng.random(3001) > 0.4
        idx, d2 = nearest_neighbor_pallas(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask), interpret=True
        )
        ref_idx, ref_d2 = _oracle(q, p, mask)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-5, atol=1e-6)

    def test_matches_xla_path(self, rng):
        q = (rng.random((513, 3)) * 5).astype(np.float32)
        p = (rng.random((2050, 3)) * 5).astype(np.float32)
        mask = rng.random(2050) > 0.2
        idx_p, d2_p = nearest_neighbor_pallas(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask), interpret=True
        )
        idx_x, d2_x, _ = jax.jit(nearest_neighbor)(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask)
        )
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
        np.testing.assert_allclose(
            np.asarray(d2_p), np.asarray(d2_x), rtol=1e-4, atol=1e-5
        )

    def test_tie_break_first_occurrence(self):
        q = np.zeros((1, 3), np.float32)
        p = np.zeros((300, 3), np.float32)  # all targets equidistant
        idx, d2 = nearest_neighbor_pallas(
            jnp.asarray(q), jnp.asarray(p), interpret=True
        )
        assert int(idx[0]) == 0
        assert float(d2[0]) == 0.0

    def test_vmap_over_pairs(self, rng):
        q = (rng.random((2, 100, 3)) * 10).astype(np.float32)
        p = (rng.random((2, 400, 3)) * 10).astype(np.float32)
        mask = rng.random((2, 400)) > 0.3
        idx, d2 = jax.vmap(
            lambda a, b, m: nearest_neighbor_pallas(a, b, m, interpret=True)
        )(jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask))
        for b in range(2):
            ref_idx, ref_d2 = _oracle(q[b], p[b], mask[b])
            np.testing.assert_array_equal(np.asarray(idx[b]), ref_idx)
            np.testing.assert_allclose(
                np.asarray(d2[b]), ref_d2, rtol=1e-5, atol=1e-6
            )

    def test_all_masked_targets(self, rng):
        q = (rng.random((10, 3))).astype(np.float32)
        p = (rng.random((100, 3))).astype(np.float32)
        mask = np.zeros(100, bool)
        idx, d2 = nearest_neighbor_pallas(
            jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask), interpret=True
        )
        assert np.all(np.asarray(d2) >= 1e11)  # everything at the penalty


class TestPallasSPFH:
    """Grid-SPFH sweep kernel (pallas/spfh.py) vs the XLA tile_fn math."""

    def _xla_tile(self, q_xyz, q_nrm, cand_xyz, cand_nrm, cand_ok, r2):
        from mapmerge_tpu.ops.descriptors.darboux import (
            bin_index,
            pair_features,
        )

        theta, alpha, phi, dist, pair_ok = pair_features(
            q_xyz[:, :, None, :], q_nrm[:, :, None, :],
            cand_xyz[:, None, :, :], cand_nrm[:, None, :, :],
        )
        d2 = dist * dist
        w = (cand_ok[:, None, :] & pair_ok & (d2 <= r2)).astype(jnp.float32)
        pi = float(np.pi)
        t_i = bin_index(theta, -pi, pi, 11)
        a_i = bin_index(alpha, -1.0, 1.0, 11)
        p_i = bin_index(phi, -1.0, 1.0, 11)
        cols = [
            jnp.sum(w * (src == b), axis=-1)
            for src in (t_i, a_i, p_i)
            for b in range(11)
        ]
        hist = jnp.stack(cols, axis=-1)
        total = jnp.sum(w, axis=-1)
        scale = jnp.where(total > 0, 100.0 / jnp.maximum(total, 1.0), 0.0)
        return hist * scale[..., None], total

    def test_parity_vs_xla(self, rng):
        from mapmerge_tpu.pallas.spfh import spfh_tile_pallas

        B, Cq, M = 2, 16, 160
        r = 0.8
        q_xyz = rng.uniform(-1, 1, (B, Cq, 3)).astype(np.float32)
        q_nrm = rng.normal(size=(B, Cq, 3)).astype(np.float32)
        q_nrm /= np.linalg.norm(q_nrm, axis=-1, keepdims=True)
        cand_xyz = rng.uniform(-1, 1, (B, M, 3)).astype(np.float32)
        # identical coordinates exercise the zero-distance self-hit
        # exclusion (PCL pairs a point with its neighbors, not itself)
        cand_xyz[:, :Cq] = q_xyz
        cand_nrm = rng.normal(size=(B, M, 3)).astype(np.float32)
        cand_nrm /= np.linalg.norm(cand_nrm, axis=-1, keepdims=True)
        cand_ok = rng.uniform(size=(B, M)) > 0.2

        ref_h, ref_t = self._xla_tile(
            jnp.asarray(q_xyz), jnp.asarray(q_nrm), jnp.asarray(cand_xyz),
            jnp.asarray(cand_nrm), jnp.asarray(cand_ok), r * r,
        )
        got_h, got_t = spfh_tile_pallas(
            jnp.asarray(q_xyz), jnp.asarray(q_nrm), jnp.asarray(cand_xyz),
            jnp.asarray(cand_nrm), jnp.asarray(cand_ok),
            r2=r * r, chunk=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t))
        # identical bin membership incl. the sector-test theta binning
        np.testing.assert_allclose(
            np.asarray(got_h), np.asarray(ref_h), atol=2e-3
        )

    def test_chunk_padding_invariance(self, rng):
        from mapmerge_tpu.pallas.spfh import spfh_tile_pallas

        B, Cq, M = 1, 8, 100  # M not a chunk multiple -> lane padding
        q_xyz = rng.uniform(-1, 1, (B, Cq, 3)).astype(np.float32)
        q_nrm = np.tile(
            np.asarray([0.0, 0.0, 1.0], np.float32), (B, Cq, 1)
        )
        cand_xyz = rng.uniform(-1, 1, (B, M, 3)).astype(np.float32)
        cand_nrm = rng.normal(size=(B, M, 3)).astype(np.float32)
        cand_nrm /= np.linalg.norm(cand_nrm, axis=-1, keepdims=True)
        cand_ok = np.ones((B, M), bool)
        a = spfh_tile_pallas(
            jnp.asarray(q_xyz), jnp.asarray(q_nrm), jnp.asarray(cand_xyz),
            jnp.asarray(cand_nrm), jnp.asarray(cand_ok),
            r2=1.0, chunk=128, interpret=True,
        )
        b = spfh_tile_pallas(
            jnp.asarray(q_xyz), jnp.asarray(q_nrm), jnp.asarray(cand_xyz),
            jnp.asarray(cand_nrm), jnp.asarray(cand_ok),
            r2=1.0, chunk=256, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]))
