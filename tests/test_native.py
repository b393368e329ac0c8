"""Native C++ component tests: build, LZF, graph-solve equivalence."""

import numpy as np
import pytest

from mapmerge_tpu import native
from mapmerge_tpu.graph.merge_graph import (
    TransformEstimate,
    compute_global_transforms,
)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


class TestLZF:
    def test_roundtrip_against_python(self, lib, rng):
        from mapmerge_tpu.io.pcd import _lzf_decompress

        # craft an LZF stream: literals only (ctrl < 32 blocks)
        payload = rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
        stream = b""
        i = 0
        while i < len(payload):
            chunk = payload[i : i + 32]
            stream += bytes([len(chunk) - 1]) + chunk
            i += len(chunk)
        out_native = native.lzf_decompress(stream, len(payload))
        out_python = _lzf_decompress(stream, len(payload))
        assert out_native == payload == out_python

    def test_backref(self, lib):
        from mapmerge_tpu.io.pcd import _lzf_decompress

        # literal "abc" then backref len 3 offset 3 -> "abcabc"... encode:
        # ctrl byte for backref: len-2=1 -> ctrl=(1<<5) | offset_high, then
        # offset_low; offset = o - ((ctrl&31)<<8) - low - 1
        stream = bytes([2]) + b"abc" + bytes([(1 << 5) | 0, 2])
        out = native.lzf_decompress(stream, 6)
        assert out == b"abcabc"
        assert _lzf_decompress(stream, 6) == b"abcabc"

    def test_malformed_returns_none(self, lib):
        assert native.lzf_decompress(b"\xff", 100) is None


def random_se3(rng):
    from test_ops_registration import random_rotation

    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = random_rotation(rng)
    t[:3, 3] = rng.normal(size=3)
    return t


class TestGraphSolveEquivalence:
    def _estimates(self, rng, n_nodes=7, extra_edges=4, fail=frozenset()):
        ests = []
        for i in range(n_nodes - 1):
            t = random_se3(rng) if (i, i + 1) not in fail else np.zeros((4, 4), np.float32)
            ests.append(
                TransformEstimate(i, i + 1, t, float(rng.random() * 10 + 1))
            )
        for _ in range(extra_edges):
            a, b = rng.choice(n_nodes, 2, replace=False)
            ests.append(
                TransformEstimate(
                    int(min(a, b)), int(max(a, b)), random_se3(rng),
                    float(rng.random() * 5),
                )
            )
        return ests

    def test_native_matches_python(self, lib, rng):
        for trial in range(5):
            ests = self._estimates(rng)
            py = compute_global_transforms.__wrapped__(ests, 0.0) if hasattr(
                compute_global_transforms, "__wrapped__"
            ) else None
            # call python path explicitly by disabling native
            import mapmerge_tpu.native as nat
            import os

            os.environ["MAPMERGE_NATIVE"] = "0"
            try:
                py = compute_global_transforms(ests, 0.0)
            finally:
                os.environ["MAPMERGE_NATIVE"] = "1"
            native_out = nat.merge_graph_solve(
                np.asarray([e.source_idx for e in ests], np.int32),
                np.asarray([e.target_idx for e in ests], np.int32),
                np.asarray([e.confidence for e in ests], np.float32),
                np.stack([e.transform for e in ests]),
                0.0,
            )
            assert native_out is not None
            assert len(py) == len(native_out)
            for a, b in zip(py, native_out):
                np.testing.assert_allclose(a, b, atol=1e-4)

    def test_threshold_equivalence(self, lib, rng):
        import os

        ests = self._estimates(rng, n_nodes=6, extra_edges=2)
        # force a split: drop middle edge below threshold
        ests[2].confidence = 0.01
        thr = 0.5
        os.environ["MAPMERGE_NATIVE"] = "0"
        try:
            py = compute_global_transforms(ests, thr)
        finally:
            os.environ["MAPMERGE_NATIVE"] = "1"
        nat = native.merge_graph_solve(
            np.asarray([e.source_idx for e in ests], np.int32),
            np.asarray([e.target_idx for e in ests], np.int32),
            np.asarray([e.confidence for e in ests], np.float32),
            np.stack([e.transform for e in ests]),
            thr,
        )
        assert len(py) == len(nat)
        for a, b in zip(py, nat):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_empty(self, lib):
        out = native.merge_graph_solve(
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.float32), np.zeros((0, 4, 4), np.float32), 0.0,
        )
        assert out is not None and len(out) == 0
