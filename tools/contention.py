#!/usr/bin/env python3
"""Mechanical contention adjudication for bench movers (r16 verdict ask #7).

Reads two bench guard JSONs (before/after, as written by graft.Bench to
target/bench.json: medians + reps_per_query + sentinel_reps) and, for every
entry whose median moved more than --threshold, decides whether the move is
CODE or CONTENTION:

- each rep i of a run has a sentinel_reps[i] measured immediately before it;
  dividing an entry's rep time by (sentinel_reps[i] / min_sentinel_overall)
  normalizes away box contention that the sentinel itself observed;
- a mover whose sentinel-normalized median ratio falls back inside the
  noise band, or whose own rep spread (max/min) exceeds --spread in either
  run (the entry swings multiples on identical code), is annotated
  "contention"; the rest stay "code".

Usage: tools/contention.py BEFORE.json AFTER.json [--threshold 1.15]
       [--spread 2.0] [--out annotated.json]
Prints a markdown table; --out writes the machine-readable verdict list.
"""
import argparse
import json
import sys


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--threshold", type=float, default=1.15)
    ap.add_argument("--spread", type=float, default=2.0)
    ap.add_argument("--out")
    args = ap.parse_args()

    b, a = load(args.before), load(args.after)
    sb, sa = b["sentinel_reps"], a["sentinel_reps"]
    base = min(sb + sa)  # the least-contended rep observed across both runs

    def norm_reps(reps, sents):
        # slot i aligns with sentinel_reps[i] (Bench preserves rep order)
        return [r / (s / base) for r, s in zip(reps, sents)]

    rows = []
    common = sorted(set(b["queries"]) & set(a["queries"]))
    for q in common:
        rb, ra = b["reps_per_query"][q], a["reps_per_query"][q]
        mb, ma = median(rb), median(ra)
        if mb <= 0 or ma <= 0:
            continue
        ratio = ma / mb
        if 1 / args.threshold < ratio < args.threshold:
            continue
        nb, na = median(norm_reps(rb, sb)), median(norm_reps(ra, sa))
        nratio = na / nb if nb > 0 else ratio
        spread_b = max(rb) / max(min(rb), 1e-9)
        spread_a = max(ra) / max(min(ra), 1e-9)
        contention = (
            1 / args.threshold < nratio < args.threshold
            or max(spread_b, spread_a) > args.spread
        )
        rows.append({
            "query": q,
            "median_before": round(mb, 4), "median_after": round(ma, 4),
            "ratio": round(ratio, 3),
            "sentinel_normalized_ratio": round(nratio, 3),
            "rep_spread_before": round(spread_b, 2),
            "rep_spread_after": round(spread_a, 2),
            "verdict": "contention" if contention else "code",
        })

    rows.sort(key=lambda r: r["ratio"])
    print(f"| query | before | after | ratio | norm-ratio | spread b/a | verdict |")
    print(f"|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r['median_before']} | {r['median_after']} "
              f"| {r['ratio']} | {r['sentinel_normalized_ratio']} "
              f"| {r['rep_spread_before']}/{r['rep_spread_after']} "
              f"| {r['verdict']} |")
    n_code = sum(1 for r in rows if r["verdict"] == "code")
    print(f"\n{len(rows)} movers beyond {args.threshold}x: "
          f"{n_code} code, {len(rows) - n_code} contention "
          f"(sentinels before={sb} after={sa})", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"threshold": args.threshold, "spread": args.spread,
                       "sentinel_reps_before": sb, "sentinel_reps_after": sa,
                       "movers": rows}, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
