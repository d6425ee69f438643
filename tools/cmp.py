"""Compare two BENCH_DETAIL-style json files (queries_min maps).

Usage: python tools/cmp.py BEFORE.json AFTER.json [--top N]
Prints total delta and the biggest per-query moves in both directions.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    a = json.load(open(args.before))
    b = json.load(open(args.after))
    qa = a.get("queries_min", a.get("queries", a))
    qb = b.get("queries_min", b.get("queries", b))
    common = sorted(set(qa) & set(qb))
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"common {len(common)} queries: {ta:.1f}s -> {tb:.1f}s "
          f"({100 * (tb - ta) / ta:+.1f}%)")
    moves = sorted(common, key=lambda q: qb[q] - qa[q])
    print("-- biggest improvements --")
    for q in moves[:args.top]:
        d = qb[q] - qa[q]
        if d < -0.05:
            print(f"{qa[q]:7.2f} -> {qb[q]:7.2f}  ({d:+.2f})  {q}")
    print("-- biggest regressions --")
    for q in reversed(moves[-args.top:]):
        d = qb[q] - qa[q]
        if d > 0.05:
            print(f"{qa[q]:7.2f} -> {qb[q]:7.2f}  ({d:+.2f})  {q}")


if __name__ == "__main__":
    main()
