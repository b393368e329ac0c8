"""TPU leg of the pair-stage scaling study (VERDICT r4 item 1; see
docs/SCALING.md).

Runs the EXACT config4 fixture (bench_configs._config4_fixture: 20 maps,
190 pairs, SIFT+FPFH+RANSAC+ICP) on the single real TPU chip and measures
the per-pair kernel time t_pair — the compute term of the multi-chip
scaling model. The CPU-mesh study (bench_configs.config4) supplies the
decomposition evidence (busy-time conservation, overhead); this run
supplies the real-chip kernel time the projection is built on.

Also reports the per-edge ambiguity flags (PairEstimate.ambiguous) so the
known-bad fixture view (map 18, floor-dominated overlaps, VERDICT r4
weak 6) is shown flagged AT REGISTRATION TIME on real hardware.

Usage: python scripts/bench_scaling_tpu.py   (TPU; ~minutes warm)
Emits one JSON line into BENCH_configs.json (config "scaling_tpu_1chip").
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from bench_configs import _config4_fixture, _tree_bytes, emit
    from mapmerge_tpu.core.cloud import stack_clouds
    from mapmerge_tpu.pipeline.merging import (
        estimate_pairs_batch,
        extract_features_batch,
    )
    from mapmerge_tpu.utils.profiling import device_sync

    clouds, truths, params, raw_cap = _config4_fixture()
    n_maps = len(clouds)
    batch = stack_clouds(clouds)

    print("[scaling-tpu] compiling feature stage...", flush=True)
    features = extract_features_batch(batch, params)  # warm
    device_sync(features)
    t0 = time.perf_counter()
    features = extract_features_batch(batch, params)
    device_sync(features)
    t_feat = time.perf_counter() - t0

    pairs = [(i, j) for i in range(n_maps - 1) for j in range(i + 1, n_maps)]
    src = jnp.asarray([p[0] for p in pairs], jnp.int32)
    tgt = jnp.asarray([p[1] for p in pairs], jnp.int32)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(0), jnp.arange(len(pairs))
    )
    print("[scaling-tpu] compiling pair stage...", flush=True)
    est = estimate_pairs_batch(features, src, tgt, params, keys)  # warm
    device_sync(est.transform)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        est = estimate_pairs_batch(features, src, tgt, params, keys)
        device_sync(est.transform)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    t_pair = wall / len(pairs)

    amb = np.asarray(est.ambiguous())
    ok = np.asarray(est.ok)
    amb_pairs = [p for k, p in enumerate(pairs) if amb[k]]
    map18 = sum(1 for i, j in amb_pairs if 18 in (i, j))
    emit(
        {
            "config": "scaling_tpu_1chip",
            "metric": "config4 fixture on 1 real TPU chip: 190-pair stage "
            "median wall (3 reps, warm) + per-pair kernel time",
            "value": round(wall, 3),
            "unit": "s",
            "t_pair_s": round(t_pair, 5),
            "pairs": len(pairs),
            "pairs_registered": int(ok.sum()),
            "feature_stage_s_20maps": round(t_feat, 3),
            "replicated_feature_bytes": _tree_bytes(features),
            "ambiguous_edges_flagged": int(amb.sum()),
            "map18_edges": 19,
            "map18_edges_flagged": map18,
        }
    )


if __name__ == "__main__":
    main()
