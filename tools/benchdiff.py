#!/usr/bin/env python3
"""Mechanical bench-regression gate: compare two bench JSON lines
(current vs previous round) per query and flag >RATIO_LIMIT changes in
either direction, with the measurement config attached so harness
changes (sink, run count, cpus) are visible next to any delta they
might explain. Round 2 burned a triage cycle on run-order noise that a
side-by-side like this would have dismissed in seconds.

Usage: benchdiff.py CURRENT.json PREVIOUS.json [ratio_limit]

Accepts either the raw one-line bench format ({"metric":...}) or the
driver's wrapper format ({"tail": "<one-line bench ...>"}).
Exit code 1 if any query regressed by more than ratio_limit (new
queries and improvements never fail the gate — only slowdowns do).
"""
import json
import sys


def load_bench(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc and "tail" in doc:
        # driver wrapper: the bench line is the (possibly truncated) tail
        # string — recover what parses; fall back to scraping pairs
        tail = doc["tail"]
        start = tail.find('{"metric"')
        if start >= 0:
            doc = json.loads(tail[start:])
        else:
            import re
            qs = dict(
                (m.group(1), float(m.group(2)))
                for m in re.finditer(r'"(q[\w]+)":([0-9.]+)', tail)
            )
            doc = {"queries": qs, "config": {k: doc.get(k) for k in ("cpus", "sf", "n")}}
    return doc


def config_of(doc):
    return {k: doc.get(k) for k in
            ("sf", "cpus", "runs_per_query", "sink", "timing", "ok") if k in doc}


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cur, prev = load_bench(sys.argv[1]), load_bench(sys.argv[2])
    limit = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    cq, pq = cur.get("queries", {}), prev.get("queries", {})

    print(f"current  config: {config_of(cur)}")
    print(f"previous config: {config_of(prev)}")
    if config_of(cur) != config_of(prev):
        print("NOTE: measurement configs differ — deltas below may be harness, not plan")
    if cur.get("ok") is False:
        print(f"current bench has ERRORS: {cur.get('errors')}")

    rows = []
    for name in sorted(set(cq) | set(pq)):
        c, p = cq.get(name), pq.get(name)
        if c is None:
            rows.append((name, p, c, "removed"))
        elif p is None:
            rows.append((name, p, c, "new"))
        elif p > 0 and (c / p > limit or p / c > limit):
            kind = "SLOWER" if c > p else "faster"
            rows.append((name, p, c, f"{kind} {c / p:.2f}x"))
    if not rows:
        print(f"no per-query changes beyond {limit}x")
    else:
        print(f"{'query':<28}{'prev_s':>10}{'cur_s':>10}  change")
        for name, p, c, note in rows:
            ps = f"{p:.3f}" if p is not None else "-"
            cs = f"{c:.3f}" if c is not None else "-"
            print(f"{name:<28}{ps:>10}{cs:>10}  {note}")

    tot_c = sum(v for v in cq.values())
    tot_p = sum(v for v in pq.values())
    print(f"total: prev {tot_p:.2f}s ({len(pq)} queries) -> cur {tot_c:.2f}s ({len(cq)} queries)")
    regressed = [r for r in rows if "SLOWER" in r[3]]
    if cur.get("ok") is False:
        print("FAIL: current bench recorded query errors")
        return 1
    if regressed:
        print(f"FAIL: {len(regressed)} queries slower than {limit}x: "
              + ", ".join(r[0] for r in regressed))
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
