#!/usr/bin/env python3
"""Independent twin for ns130 (graft.ns.TextOps.isotonicQualityCalibration).

NOT part of the engine — the ns88/gen_linear.py convention: a second,
from-scratch implementation of the same deterministic algorithm whose
checked-in output gates the Spark implementation bit-for-bit.

Algorithm (must match TextOps exactly):
  score:   ns73 linear logit — bias -50000 plus the checked-in
           micro-unit weight per vocabulary-token occurrence over the
           whitespace-normalized lowercased text
  label:   1 iff the five Gopher checks all pass (ns09 gate), else 0
  buckets: fixed-width integer floor over [min, max]:
           b = (score - min) * B // (max - min + 1), B = 16
  PAV:     pool adjacent buckets while a later pool's label mean is
           below an earlier one's (cross-multiplied integers)
  readout: cal_micro = 1_000_000 * pooled_pos // pooled_n
All arithmetic is integer, so any correct implementation agrees.

Usage: python3 tools/gen_isotonic.py [SF_DIR] [BUCKETS]
Writes src/test/resources/graft/isotonic_cal_sf001.parquet
"""
import os
import re
import sys

import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 16

WEIGHTS = {
    "the": 40000, "and": 30000, "of": 30000, "to": 25000, "a": 25000,
    "in": 20000, "is": 20000, "it": 15000, "for": 15000, "with": 15000,
    "lorem": -250000, "ipsum": -250000, "click": -120000,
    "subscribe": -150000, "cookie": -100000, "buy": -90000,
    "winner": -120000, "free": -80000, "http": -60000,
}
BIAS = -50000
STOPWORDS = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
PUNCT = re.compile(r"[^A-Za-z0-9\s]")


def score_and_label(text):
    norm = re.sub(r"\s+", " ", text.strip().lower())
    toks = norm.split(" ")
    score = BIAS + sum(WEIGHTS.get(t, 0) for t in toks)
    n_words = len(toks)
    n_chars = len(text)
    awl = len(norm.replace(" ", "")) / n_words
    punct = len(PUNCT.findall(text)) / n_chars
    sw = sum(1 for t in toks if t in STOPWORDS) / n_words
    ok = (50 <= n_chars <= 100000 and 10 <= n_words <= 50000 and
          2.0 <= awl <= 12.0 and punct <= 0.2 and sw >= 0.01)
    return score, (1 if ok else 0)


def pav(buckets):
    # buckets: sorted [(bucket, n, n_pos)]; returns {bucket: (pos, n)}
    pools = []  # [pos, n, [members]]
    for bk, n, pos in buckets:
        pools.append([pos, n, [bk]])
        while len(pools) >= 2 and \
                pools[-1][0] * pools[-2][1] < pools[-2][0] * pools[-1][1]:
            pos2, n2, m2 = pools.pop()
            pools[-1][0] += pos2
            pools[-1][1] += n2
            pools[-1][2].extend(m2)
    return {m: (p[0], p[1]) for p in pools for m in p[2]}


def main():
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    sl = [score_and_label(t) for t in docs["text"]]
    lo = min(s for s, _ in sl)
    hi = max(s for s, _ in sl)
    width = hi - lo + 1
    agg = {}
    for s, y in sl:
        b = (s - lo) * BUCKETS // width
        n, pos = agg.get(b, (0, 0))
        agg[b] = (n + 1, pos + y)
    per = sorted((b, n, pos) for b, (n, pos) in agg.items())
    pooled = pav(per)
    rows = [(b, n, pos, 1_000_000 * pooled[b][0] // pooled[b][1])
            for b, n, pos in per]
    out = pd.DataFrame(rows,
                       columns=["bucket", "n", "n_pos", "cal_micro"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "src/test/resources/graft/isotonic_cal_sf001.parquet")
    out.to_parquet(dest, index=False)
    print(f"wrote {dest}")
    print(out.to_string(index=False))


if __name__ == "__main__":
    main()
