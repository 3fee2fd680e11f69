#!/usr/bin/env python
"""Regenerate README's measured-performance table from docs/measured.json.

One source of truth for the headline numbers (VERDICT r2: README, BENCH
and docs drifted apart). Update docs/measured.json with freshly measured
figures, then:

    python tools/gen_perf_table.py

rewrites the block between `<!-- perf:begin -->` and `<!-- perf:end -->`
in README.md. bench.py emits the same scales in its JSON line, so
BENCH_r*.json stays comparable.
"""

import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fmt_qps(v):
    return f"{v/1e6:.2f}M q/s" if v >= 1e6 else f"{v/1e3:.0f}k q/s"


def main():
    with open(os.path.join(_ROOT, "docs", "measured.json")) as f:
        data = json.load(f)
    rows = []
    for row in data["scales"]:
        speed = row["qps"] / row["ref_qps"]
        bs = row["qps"] / row["onchip_binsearch_qps"]
        rows.append(
            f"| {row['label']} | **{fmt_qps(row['qps'])}** ({row['config']}) "
            f"| {fmt_qps(row['ref_qps'])} | {speed:,.1f}× | {bs:.1f}× |")
    al = data.get("aligner")
    al_lines = []
    if al is not None:
        def _one(s):
            if s["ref_reads_per_s"] is None:
                return (f"{s['genome']}: **{s['reads_per_s']:,} reads/s**"
                        f" (reference aligner cannot build its in-memory"
                        f" SA at this scale on the same host)")
            return (f"{s['genome']}: **{s['reads_per_s']:,} reads/s** vs "
                    f"{s['ref_reads_per_s']:,} = "
                    f"**{s['reads_per_s']/s['ref_reads_per_s']:.1f}×**")
        parts = "; ".join(_one(s) for s in al["scales"])
        al_lines = [
            "",
            f"Aligner (FASTQ→SAM, {al['label']}, {al['config']}) — "
            f"{parts}. {al['note']}.",
        ]
    sweep = data.get("length_sweep")
    sweep_lines = []
    if sweep is not None:
        # reference sweep axis: eval/VarQuery/plot_query_length_runtime.py
        # :16-27 (GRCh38, 5M queries/length, seconds -> q/s)
        hdr = "| Query length | " + " | ".join(
            str(e["len"]) for e in sweep["entries"]) + " |"
        sep = "|---|" + "---|" * len(sweep["entries"])
        ours = "| " + sweep["label"] + " | " + " | ".join(
            f"**{fmt_qps(e['qps'])}**" for e in sweep["entries"]) + " |"
        refs = "| Reference best (GRCh38, 1 thread) | " + " | ".join(
            fmt_qps(e["ref_qps"]) if e.get("ref_qps") else "—"
            for e in sweep["entries"]) + " |"
        sweep_lines = ["", hdr, sep, ours, refs, "", sweep["note"]]
    table = "\n".join([
        "| Genome scale | This framework | Reference best (1 CPU thread) "
        "| Speedup | vs on-chip binary search |",
        "|---|---|---|---|---|",
        *rows,
        "",
        data["footnote"],
        *al_lines,
        *sweep_lines,
        f"\n*Measured {data['measured_on']}; regenerate with "
        f"`python tools/gen_perf_table.py` from docs/measured.json.*",
    ])
    readme = os.path.join(_ROOT, "README.md")
    src = open(readme).read()
    out, nsub = re.subn(
        r"(<!-- perf:begin -->\n).*?(<!-- perf:end -->)",
        lambda m: m.group(1) + table + "\n" + m.group(2), src, flags=re.S)
    if nsub != 1:
        sys.exit("README.md perf markers not found")
    open(readme, "w").write(out)
    print("README.md performance table regenerated")


if __name__ == "__main__":
    main()
