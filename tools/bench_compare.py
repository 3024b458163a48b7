"""Cross-round bench comparison under the frozen (r03+) protocol.

Usage: python tools/bench_compare.py OLD.json NEW1.json [NEW2.json ...]

Per shared query, compares the OLD timing against the MIN across the new
interleaved runs (the discipline from tools/scaling_bench.py — the box's
noisy neighbors make single runs swing 1.5-4×) and prints a markdown
table with a regression/no-regression statement per query (threshold:
>25% slower on the min-of-new reads as a flag; VERDICT r03 item #5).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_path, new_paths = sys.argv[1], sys.argv[2:]
    old = json.load(open(old_path))["queries"]
    news = [json.load(open(p))["queries"] for p in new_paths]
    keys = [k for k in old if all(k in n for n in news)]
    new_only = sorted(k for k in news[0] if k not in old)
    lines = [
        "# BENCH r03 → r04 — like-for-like per-query comparison",
        "",
        f"Protocol frozen since r03 (best-of-2 per query, noop-write sink).",
        f"NEW column = min across {len(news)} interleaved full bench runs;",
        "flag threshold: new/old > 1.25 (neighbor noise on this box swings",
        "single runs 1.5-4×, so only the min-of-runs read is meaningful).",
        "",
        "| query | r03 s | r04 s (min) | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    flagged = []
    for k in keys:
        o = old[k]
        n = min(nn[k] for nn in news)
        ratio = n / o if o else float("inf")
        verdict = "no regression" if ratio <= 1.25 else "FLAG (>25% slower)"
        if ratio > 1.25:
            flagged.append((k, o, n, ratio))
        lines.append(f"| {k} | {o:.3f} | {n:.3f} | {ratio:.2f}× | {verdict} |")
    lines.append("")
    if new_only:
        lines.append(f"New r04-only rows (no r03 baseline): {', '.join(new_only)}.")
        lines.append("")
    if flagged:
        lines.append("## Flagged queries")
        lines.append("")
        for k, o, n, r in flagged:
            lines.append(f"- **{k}**: {o:.3f}s → {n:.3f}s ({r:.2f}×)")
    else:
        lines.append("**No query regressed >25% on the min-of-runs read.**")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
