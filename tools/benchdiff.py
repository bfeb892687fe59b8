#!/usr/bin/env python3
"""Diff two bench outputs per query (round-over-round regression check).

Usage: benchdiff.py OLD NEW [--threshold 0.2]

Accepts either the raw one-line JSON printed by graft.Bench or the
driver's BENCH_r{N}.json wrapper (which embeds that line in "tail").
Reports per-query delta on the median and flags regressions above the
threshold; when both files carry `queries_min`, a regression is only
flagged if the MIN also moved (median-only movement = environment
noise, see Bench.scala's measurement protocol).
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    try:
        j = json.loads(text)
    except json.JSONDecodeError:
        j = None
    if j is not None and "queries" in j:
        return j
    # driver wrapper or sbt-prefixed line: find the bench JSON inside
    m = re.search(r'\{"metric":"total".*?\}\}(?=[^}]*$)|\{"metric":"total".*\}', text, re.S)
    if j is not None and "tail" in j:
        m = re.search(r'\{"metric":"total".*', j["tail"])
        text = j["tail"]
    if not m:
        sys.exit(f"{path}: no bench JSON found")
    frag = m.group(0)
    # the line may be truncated in a wrapper tail; balance braces
    depth, end = 0, None
    for i, c in enumerate(frag):
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    if end is None:
        sys.exit(f"{path}: bench JSON is truncated (unbalanced braces)")
    return json.loads(frag[:end])


def main():
    # accept both --threshold=X and --threshold X (the latter consumes
    # the following token, which must not be mistaken for a file arg)
    raw = sys.argv[1:]
    args, thr, i = [], 0.2, 0
    while i < len(raw):
        a = raw[i]
        if a == "--threshold" or a.startswith("--threshold="):
            try:
                if "=" in a:
                    thr = float(a.split("=", 1)[1])
                elif i + 1 < len(raw):
                    thr = float(raw[i + 1])
                    i += 1
                else:
                    sys.exit("--threshold needs a value")
            except ValueError:
                sys.exit(f"--threshold needs a numeric value, got {a.split('=', 1)[-1] if '=' in a else raw[i + 1]}")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit("usage: benchdiff.py OLD NEW [--threshold 0.2]")
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    omin, nmin = old.get("queries_min", {}), new.get("queries_min", {})
    regressions = []
    print(f"{'query':34} {'old':>8} {'new':>8} {'delta':>8}")
    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        if o is None or n is None:
            print(f"{name:34} {'--' if o is None else round(o, 2):>8} "
                  f"{'--' if n is None else round(n, 2):>8} {'new' if o is None else 'gone':>8}")
            continue
        # Bench records -1 for a query that errored: that's a failure,
        # not a timing — never report it as a speedup
        if o < 0 and n < 0:
            print(f"{name:34} {'FAIL':>8} {'FAIL':>8} {'':>8} still failing")
            continue
        if n < 0:
            print(f"{name:34} {o:8.2f} {'FAIL':>8} {'':>8} REGRESSION (query now errors)")
            regressions.append(name)
            continue
        if o < 0:
            print(f"{name:34} {'FAIL':>8} {n:8.2f} {'':>8} fixed")
            continue
        delta = (n - o) / o if o > 0 else 0.0
        flag = ""
        if delta > thr:
            min_moved = (name not in omin or name not in nmin or
                         (nmin[name] - omin[name]) / max(omin[name], 1e-9) > thr)
            flag = " REGRESSION" if min_moved else " noise?"
            if min_moved:
                regressions.append(name)
        print(f"{name:34} {o:8.2f} {n:8.2f} {delta:+8.0%}{flag}")
    ot, nt = old.get("value", 0), new.get("value", 0)
    print(f"\ntotal: {ot:.1f}s -> {nt:.1f}s ({(nt - ot) / ot:+.0%})" if ot else "")
    if regressions:
        print(f"{len(regressions)} regression(s): {', '.join(regressions)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
