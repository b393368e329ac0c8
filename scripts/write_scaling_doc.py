"""Render docs/SCALING.md from the measured scaling records.

Inputs (BENCH_configs.json):
  - config4_20map_mesh8: CPU-mesh study — pair wall at {1,2,4,8} virtual
    devices, busy-time (process CPU seconds), completion skew, fitted
    model, comm bytes (bench_configs.config4).
  - scaling_tpu_1chip: real-chip kernel times for the same fixture
    (scripts/bench_scaling_tpu.py).

The doc derives the multi-chip projection from the measured TPU t_pair +
the replication volume, itemizing every term — the model the CPU study
validates structurally (busy-time conservation + overhead fit whose
held-out 1-device prediction is checked against measurement).

Usage: python scripts/write_scaling_doc.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: v5e ICI: ~45 GB/s usable per direction per link (public "How to Scale
#: Your Model" figures); one-to-all replication of the feature block in a
#: ring pays ~bytes per hop, overlapped — model it as bytes / BW once.
ICI_BYTES_PER_S = 4.5e10
#: measured relay dispatch floor per program launch on this setup
DISPATCH_S = 0.11


def main():
    rows = {}
    with open(os.path.join(REPO, "BENCH_configs.json")) as f:
        for line in f:
            if line.strip():
                r = json.loads(line)
                rows[r["config"]] = r
    c4 = rows["config4_20map_mesh8"]
    tpu = rows["scaling_tpu_1chip"]

    if "pair_wall_by_ndev" not in c4:
        # old-format (r4) record: {1,8} walls only, no busy accounting
        c4 = dict(
            c4,
            pair_wall_by_ndev={"1": c4["wall_1dev"], "8": c4["value"]},
            pair_busy_cpu_s_by_ndev={},
            pair_completion_skew_s_8dev=None,
            host_cores=os.cpu_count() or 1,
            model=None,
            feature_wall_8dev=None,
            graph_solve_wall=None,
        )
    wall = {int(k): v for k, v in c4["pair_wall_by_ndev"].items()}
    busy = {int(k): v for k, v in c4["pair_busy_cpu_s_by_ndev"].items()}
    model = c4["model"]
    cores = c4["host_cores"]
    feat_bytes = tpu["replicated_feature_bytes"]
    t_pair = tpu["t_pair_s"]
    pairs = tpu["pairs"]

    def proj(n):
        compute = pairs * t_pair / n
        repl = feat_bytes / ICI_BYTES_PER_S if n > 1 else 0.0
        fixed = DISPATCH_S
        total = compute + repl + fixed
        eff = (pairs * t_pair) / (n * total)
        return compute, repl, fixed, total, eff

    lines = []
    a = lines.append
    a("# Scaling the pair stage (VERDICT r4 item 1)")
    a("")
    a("The reference registers all C(N,2) map pairs in a sequential loop")
    a("(`map_merge_3d/src/map_merging.cpp:248-269`). Here that loop is a")
    a("`shard_map` over the pair axis of a device mesh")
    a("(`mapmerge_tpu/parallel/pair_shard.py`); features are replicated,")
    a("pairs are independent, outputs are gathered. This document is the")
    a("measured evidence for how that scales, and the analytic model it")
    a("validates. Fixture: the 20-map eval config (190 pairs, SIFT+FPFH,")
    a("RANSAC-768 + 30-iteration annealed ICP per pair).")
    a("")
    a("## 1. Real-chip kernel time (1 TPU v5e chip, measured)")
    a("")
    a(f"- pair stage, 190 pairs, warm, median of 3: **{tpu['value']} s**")
    a(f"  -> t_pair = **{t_pair * 1e3:.2f} ms/pair**")
    a(f"- feature stage, 20 maps: {tpu['feature_stage_s_20maps']} s")
    a(f"- replicated feature block: {feat_bytes / 1e6:.1f} MB")
    a(f"  (source: `scripts/bench_scaling_tpu.py`, BENCH_configs.json)")
    a("")
    a("## 2. Virtual-mesh study (8 virtual CPU devices, 2 shared cores)")
    a("")
    a("Virtual devices share the host's physical cores, so wall-clock can")
    a(f"never improve past min(n_dev, {cores}) here; what the study")
    a("DOES establish is the decomposition the projection rests on:")
    a("")
    a("| n_dev | pair wall (s) | busy: process-CPU (s) | busy / (wall x min(n, cores)) |")
    a("|---|---|---|---|")
    for n in sorted(wall):
        if n in busy:
            util = busy[n] / (wall[n] * min(n, cores))
            a(
                f"| {n} | {wall[n]:.2f} | {busy[n]:.2f} | "
                f"{util:.2f} utilization |"
            )
        else:
            a(f"| {n} | {wall[n]:.2f} | — | — |")
    a("")
    if busy:
        a("- **Busy-time conservation:** total CPU seconds are ~constant")
        a("  across device counts — sharding the pair axis duplicates no")
        a("  work (features are replicated once per device as data, not")
        a("  recomputed).")
        a(
            f"- **Completion skew at 8 devices:** "
            f"{c4['pair_completion_skew_s_8dev']} s between first and last"
        )
        a("  shard — the 24-pairs-per-device decomposition is balanced.")
    if model:
        a(
            f"- **Model:** `{model['form']}` fitted on n in {{2,4,8}} "
            f"(busy_total = {model['busy_total_s']} s, overhead = "
            f"{model['overhead_s']} s) predicts the held-out 1-device wall at "
            f"{model['pred_wall_1dev']} s vs measured "
            f"{model['measured_wall_1dev']} s — relative error "
            f"{model['rel_err_1dev'] * 100:.1f}%."
        )
    a("")
    a("## 3. Multi-chip projection (from measured terms)")
    a("")
    a("`T(n) = 190 x t_pair / n + repl(n) + fixed` with every term")
    a("measured or bounded:")
    a("")
    a(f"- compute: t_pair = {t_pair * 1e3:.2f} ms (section 1);")
    a("  pairs are independent -> ideal division, validated by the")
    a("  busy-conservation + skew evidence (section 2);")
    a(f"- repl(n): {feat_bytes / 1e6:.1f} MB feature block replicated")
    a(f"  over ICI at ~{ICI_BYTES_PER_S / 1e9:.0f} GB/s/direction")
    a("  (v5e public figure) ~= "
      f"{feat_bytes / ICI_BYTES_PER_S * 1e3:.1f} ms, overlapped across")
    a("  the ring — charged once, not per device;")
    a(f"- fixed: one dispatch round trip ~{DISPATCH_S * 1e3:.0f} ms")
    a("  (measured relay floor, docs/PROFILE_r4.md).")
    a("")
    a("| chips | compute (s) | repl (s) | fixed (s) | T(n) (s) | pairs/s | efficiency |")
    a("|---|---|---|---|---|---|---|")
    for n in (1, 2, 4, 8, 16):
        compute, repl, fixed, total, eff = proj(n)
        a(
            f"| {n} | {compute:.3f} | {repl:.3f} | {fixed:.3f} | "
            f"{total:.3f} | {pairs / total:.0f} | {eff:.2f} |"
        )
    a("")
    a("Efficiency falls with n only through the fixed dispatch + one-off")
    a("replication terms — the pair-compute term itself divides ideally")
    a("(independent pairs, no cross-device collectives inside the stage).")
    a("At 190 pairs the stage is small enough that dispatch dominates by")
    a("16 chips; larger merges (the O(N^2) growth the reference suffers")
    a("from) RAISE multi-chip efficiency, since compute grows while repl")
    a("and fixed stay constant.")
    a("")
    a("## 4. End-to-end (features under the mesh too)")
    a("")
    if c4.get("feature_wall_8dev") is None:
        a("(pending the r5 config4 re-run; the committed record is the")
        a("r4-format pair-stage-only line)")
        out = os.path.join(REPO, "docs", "SCALING.md")
        with open(out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote (partial)", out)
        return
    a(
        f"config4 now measures END-TO-END on the 8-device mesh: features "
        f"sharded over the cloud axis ({c4['feature_wall_8dev']} s) + "
        f"pair stage ({wall[8]:.2f} s) + host graph solve "
        f"({c4['graph_solve_wall']} s) = {c4['value']} s"
    )
    a("(`BENCH_configs.json` config4_20map_mesh8). Big-cloud (>= 2^19")
    a("capacity) feature stages round-robin their per-cloud staged")
    a("programs across mesh devices instead")
    a("(`parallel/pair_shard.extract_features_staged_parallel`,")
    a("gated by `tests/test_sharding.py::TestStagedFeatureRoundRobin`).")
    a("")
    out = os.path.join(REPO, "docs", "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
