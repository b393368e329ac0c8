"""Round-over-round benchmark history (observability tooling).

Collates the committed bench artifacts — BENCH_r*.json (the driver's
headline metric per round) and BENCH_configs.json (eval configs #2-#5) —
into one table, printed and written to docs/BENCH_HISTORY.md, so the
framework's performance trajectory is a checkable artifact rather than
scattered JSON (VERDICT r2 "metrics/observability" gap).

Usage: python scripts/bench_history.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapmerge_tpu.utils.metrics import read_jsonl  # noqa: E402


def headline_rows() -> list[dict]:
    rows = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        parsed = data.get("parsed") or {}
        if not parsed:
            continue
        rows.append(
            {
                "round": data.get("n"),
                "value": parsed.get("value"),
                "unit": parsed.get("unit"),
                "vs_baseline": parsed.get("vs_baseline"),
            }
        )
    return rows


def config_rows() -> list[dict]:
    path = os.path.join(REPO, "BENCH_configs.json")
    if not os.path.exists(path):
        return []
    return read_jsonl(path)


def fmt_table(headers: list[str], rows: list[list]) -> str:
    out = ["| " + " | ".join(headers) + " |",
           "|" + "|".join("---" for _ in headers) + "|"]
    for row in rows:
        out.append("| " + " | ".join(str(c) for c in row) + " |")
    return "\n".join(out)


def main() -> None:
    lines = ["# Benchmark history", ""]

    hl = headline_rows()
    lines += ["## Headline metric per round (BENCH_r*.json)", ""]
    lines += [
        "Driver-recorded at end of each round on the real TPU chip: "
        "pairwise registrations/sec/chip on eval config #1 "
        "(~50k-pt pair, SIFT+FPFH+RANSAC+ICP end-to-end); vs_baseline = "
        "speedup over the frozen CPU-oracle wall-clock "
        "(golden/config1.json).",
        "",
    ]
    lines.append(
        fmt_table(
            ["round", "pairs/s", "vs oracle"],
            [[r["round"], r["value"], f'{r["vs_baseline"]}x'] for r in hl],
        )
    )

    cfg = config_rows()
    lines += ["", "## Eval configs #2-#5 (BENCH_configs.json, latest run)", ""]
    rows = []
    for r in cfg:
        extras = []
        if "vs_baseline" in r:
            extras.append(f'{r["vs_baseline"]}x oracle')
        if "end_to_end_drift_deg_m" in r:
            d = r["end_to_end_drift_deg_m"]
            extras.append(f"drift {d[0]} deg / {d[1]} m")
        if "scaling_efficiency" in r:
            extras.append(f'1->8 eff {r["scaling_efficiency"]}')
        if "pose_err_deg_m" in r:
            p = r["pose_err_deg_m"]
            extras.append(f"pose err {p[0]} deg / {p[1]} m")
        rows.append(
            [r["config"], f'{r["value"]} {r["unit"]}', "; ".join(extras)]
        )
    lines.append(fmt_table(["config", "wall", "quality / ratio"], rows))
    lines.append("")

    text = "\n".join(lines)
    print(text)
    out = os.path.join(REPO, "docs", "BENCH_HISTORY.md")
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
