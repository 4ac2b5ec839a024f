#!/usr/bin/env python
"""Render bench.py JSON lines as a BASELINE.md-style markdown table.

Usage: python tools/bench_table.py results/bench_r4b.out
"""

import json
import sys


def fmt(v, nd=3):
    return "—" if v is None else f"{v:.{nd}g}"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "results/bench_r4b.out"
    rows = []
    for line in open(path, errors="replace"):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" not in d:
            continue
        rows.append(d)
    print("| model | edges/s | vs r02 | MFU | body bytes/step | "
          "hbm_bw_frac | roofline_frac | binds | ms/step |")
    print("|---|---|---|---|---|---|---|---|---|")
    for d in rows:
        name = (d["metric"].replace("_trainstep", "")
                .replace("_edges_per_s_per_chip", "")
                .replace("_copyedges_per_s_per_chip", " (copy)"))
        bps = d.get("bytes_per_step_scanbody") or d.get("bytes_per_step")
        print("| {} | {} | {} | {} | {} | {} | {} | {} | {} |".format(
            name,
            f"{d['value']/1e6:.2f} M",
            fmt(d.get("vs_baseline")),
            fmt(d.get("mfu")),
            "—" if bps is None else f"{bps/1e6:.0f} MB",
            fmt(d.get("hbm_bw_frac")),
            fmt(d.get("roofline_frac")),
            d.get("binding_resource") or "—",
            fmt(d.get("ms_per_step"), 4),
        ))


if __name__ == "__main__":
    main()
