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
