#!/usr/bin/env python3
"""Per-code-path-family wall/CPU sums from Bench artifacts.

Usage: scripts/cpu_families.py A.json B.json ...

For each artifact, sums per-query `median` (wall) and `cpu_median`
(process CPU) within coarse code-path families, so loaded-vs-idle runs
can be compared family-by-family: if `cpu_median` is stable (~1.2x)
across a >=2x wall spread, CPU is the valid cross-round adjudication
signal; wall under load is not (round-11 driver run stretched
individual queries 40-120x).
"""
import json
import re
import sys

FAMILIES = [
    ("streaming", re.compile(
        r"stream|tws|statestore|^q24_|^q84_|^q317_|^q351_|^q361_|^q377_|^q403_")),
    ("graph_bsp", re.compile(
        r"pagerank|scc|bfs|components|_mis|sssp|diameter|walk|^q76_|^q88_|"
        r"^q204_|^q211_|^q298_|^q312_|^q316_|^q340_|^q344_|^q411_")),
    ("simsearch", re.compile(
        r"minhash|simhash|jaccard|knn|ivf|embed|quant|_pq_|lsh|cosine|"
        r"neardup|semantic")),
    ("text", re.compile(
        r"bpe|tfidf|bm25|token|lang|gopher|surprisal|suffix|rake|ngram|"
        r"kneser|dsir|decontam")),
    ("sources", re.compile(
        r"avro|_csv_|_orc_|_xml_|json_sink|jdbc|binaryfile|daywindow|dsv2|"
        r"_ocf_|merge|time_travel|delete|update")),
]


def family(name: str) -> str:
    for fam, rx in FAMILIES:
        if rx.search(name):
            return fam
    return "relational"


def summarize(path: str):
    # Degrade, don't crash, on non-full artifacts: a captured stdout
    # totals line has "value" instead of "total_median" and per-query
    # seconds (or null) instead of per-query dicts.
    d = json.load(open(path))
    wall = {}
    cpu = {}
    n = {}
    cpu_missing = 0
    for q, v in d.get("queries", {}).items():
        if not isinstance(v, dict):
            v = {"median": v, "failed": v is None}
        if v.get("failed"):
            continue
        f = family(q)
        wall[f] = wall.get(f, 0.0) + v["median"]
        # Skip (and count) queries without a cpu_median rather than
        # summing NaN — one missing field would otherwise poison the
        # whole family's CPU sum.
        c = v.get("cpu_median")
        if c is None:
            cpu_missing += 1
        else:
            cpu[f] = cpu.get(f, 0.0) + c
        n[f] = n.get(f, 0) + 1
    if cpu_missing:
        print(f"note: {path}: {cpu_missing} queries lack cpu_median "
              f"(excluded from CPU sums)", file=sys.stderr)
    tw = d.get("total_median", d.get("value"))
    return (wall, cpu, n, tw if tw is not None else float("nan"),
            d.get("total_cpu_median"))


def main():
    rows = [(p, *summarize(p)) for p in sys.argv[1:]]
    fams = sorted({f for _, w, _, _, _, _ in rows for f in w})
    print(f"{'artifact':42s} " + " ".join(f"{f:>22s}" for f in fams) +
          f" {'TOTAL':>22s}")
    for p, wall, cpu, n, tw, tc in rows:
        cells = [
            f"{wall.get(f, 0):8.1f}w {cpu.get(f, 0):8.1f}c ({n.get(f, 0):3d})"
            for f in fams]
        print(f"{p:42s} " + " ".join(f"{c:>22s}" for c in cells) +
              f" {tw:10.1f}w {tc if tc is not None else float('nan'):8.1f}c")
    if len(rows) >= 2:
        print("\nratios vs first artifact (wall | cpu):")
        _, w0, c0, _, tw0, tc0 = rows[0]
        for p, wall, cpu, _, tw, tc in rows[1:]:
            cells = []
            for f in fams:
                rw = wall.get(f, 0) / w0.get(f, 1e-9)
                rc = cpu.get(f, 0) / c0.get(f, 1e-9)
                cells.append(f"{rw:6.2f}|{rc:5.2f}")
            rtw = tw / tw0 if tw0 else float("nan")
            rt = f"{rtw:6.2f}|{(tc / tc0) if tc and tc0 else float('nan'):5.2f}"
            print(f"{p:42s} " + " ".join(f"{c:>22s}" for c in cells) +
                  f" {rt:>22s}")


if __name__ == "__main__":
    main()
