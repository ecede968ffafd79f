#!/usr/bin/env python3
"""Render the SCALE.md sf0.1 -> sf1 per-query table from two Bench
metric lines (dev-side helper, like check_oracle.py — not part of the
engine). Usage: scale_table.py bench_sf01.json bench_sf1.json

Reads the FIRST line of each file (the full metric line with the
per-query map), prints a markdown table sorted by sf1 time desc, with
the x-factor vs the 10x data growth, and a sublinear/superlinear tag.
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.readline())


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in sorted(qb, key=lambda n: -qb[n]):
        if name not in qa:
            continue
        ratio = qb[name] / qa[name] if qa[name] > 0 else float("inf")
        rows.append((name, qa[name], qb[name], ratio))
    print("| query | sf0.1 s | sf1 s | x | vs 10x data |")
    print("|---|---|---|---|---|")
    for name, ta, tb, r in rows:
        tag = "sublinear" if r < 10 else ("~linear" if r < 13 else "SUPER")
        print(f"| {name} | {ta:.2f} | {tb:.2f} | {r:.1f}x | {tag} |")
    n_sub = sum(1 for *_, r in rows if r < 10)
    n_lin = sum(1 for *_, r in rows if 10 <= r < 13)
    print(f"\ntotal {a['value']:.1f} -> {b['value']:.1f} s "
          f"({b['value']/a['value']:.1f}x); core {a['core_total']:.1f} -> "
          f"{b['core_total']:.1f} s; {n_sub} sublinear, {n_lin} ~linear, "
          f"{len(rows)-n_sub-n_lin} superlinear of {len(rows)}")


if __name__ == "__main__":
    main()
