#!/usr/bin/env python3
"""Emit the whole-registry sf0.1-vs-sf1 markdown table for PERF.md.

Usage: python3 scripts/sf1_table.py <sf01_bench_json_line_file> <sf1_bench_json_line_file>

Each input file must contain the single JSON line graft.Bench prints
(grep '"metric"' from the sbt log). Rows are sorted by sf1 cost
descending; ratios > 10x are flagged for a written mechanism in PERF.md.
"""
import json
import sys


def load(path: str) -> dict:
    """Accept either the legacy single line (queries + value together) or
    the round-7+ split output: a BENCH-QUERIES per-query line (full map)
    and a final summary line whose stub is named top5. The full map plus
    the summary total are merged into one dict.
    """
    merged = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("BENCH-QUERIES "):
                line = line[len("BENCH-QUERIES "):]
            if not line.startswith('{"metric"'):
                continue
            d = json.loads(line)
            if d.get("metric") == "per_query":
                merged["queries"] = d["queries"]
            elif d.get("metric") == "total":
                merged["value"] = d["value"]
                if "queries" in d:  # legacy combined line carried the full map
                    merged["queries"] = d["queries"]
    if "queries" in merged:
        merged.setdefault("value", round(sum(v for v in merged["queries"].values() if v > 0), 3))
        return merged
    raise SystemExit(f"no bench JSON line in {path}")


def main(p01: str, p1: str) -> None:
    a, b = load(p01), load(p1)
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q in sorted(qb):
        t1 = qb[q]
        t01 = qa.get(q)
        ratio = (t1 / t01) if (t01 and t01 > 0 and t1 > 0) else None
        rows.append((q, t01, t1, ratio))
    rows.sort(key=lambda r: -(r[2] if r[2] > 0 else 0))
    print(f'sf0.1 total {a["value"]} s, sf1 total {b["value"]} s '
          f'(x{b["value"]/a["value"]:.2f} for 10x data)')
    flagged = [r for r in rows if r[3] and r[3] > 10]
    print(f"rows over 10x: {len(flagged)}: {[r[0] for r in flagged]}")
    print()
    print("| query | sf0.1 (s) | sf1 (s) | ratio |")
    print("|---|---|---|---|")
    for q, t01, t1, ratio in rows:
        r = f"x{ratio:.1f}" if ratio else "—"
        t01s = f"{t01:.2f}" if t01 is not None else "—"
        flag = " **>10x**" if ratio and ratio > 10 else ""
        print(f"| {q} | {t01s} | {t1:.2f} | {r}{flag} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
