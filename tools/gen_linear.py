#!/usr/bin/env python3
"""Independent trainer twin for ns123 (graft.ns.TextOps.trainLinearQuality).

NOT part of the engine — the ns88/gen_bpe.py convention: a second,
from-scratch implementation of the same deterministic algorithm whose
checked-in output gates the Spark implementation bit-for-bit.

Algorithm (must match TextOps.trainLinearQuality exactly):
  labels:   y = +1 iff the five Gopher checks all pass (ns09 gate),
            else -1
  features: x = counts of the ns73 vocabulary tokens in the
            whitespace-normalized lowercased text, plus bias count 1
  loop:     w <- 0; for each of 16 epochs:
              w <- w + sum over {docs with y*(w.x) <= 0} of y*x
All arithmetic is integer, the update depends only on the SET of
misclassified docs, so any correct implementation agrees exactly.

Usage: python3 tools/gen_linear.py [SF_DIR] [EPOCHS]
Writes src/test/resources/graft/linear_weights_sf001.parquet
"""
import os
import re
import sys

import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 16

VOCAB = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "with",
         "lorem", "ipsum", "click", "subscribe", "cookie", "buy",
         "winner", "free", "http"]
STOPWORDS = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
PUNCT = re.compile(r"[^A-Za-z0-9\s]")


def features_and_label(text):
    norm = re.sub(r"\s+", " ", text.strip().lower())
    toks = norm.split(" ")
    n_words = len(toks)
    n_chars = len(text)
    awl = len(norm.replace(" ", "")) / n_words
    punct = len(PUNCT.findall(text)) / n_chars
    sw = sum(1 for t in toks if t in STOPWORDS) / n_words
    ok = (50 <= n_chars <= 100000 and 10 <= n_words <= 50000 and
          2.0 <= awl <= 12.0 and punct <= 0.2 and sw >= 0.01)
    y = 1 if ok else -1
    counts = {v: 0 for v in VOCAB}
    for t in toks:
        if t in counts:
            counts[t] += 1
    x = [counts[v] for v in VOCAB] + [1]
    return y, x


def main():
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    rows = [features_and_label(t) for t in docs["text"]]
    dim = len(VOCAB) + 1
    w = [0] * dim
    for _ in range(EPOCHS):
        g = [0] * dim
        for y, x in rows:
            if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0:
                for i in range(dim):
                    g[i] += y * x[i]
        w = [wi + gi for wi, gi in zip(w, g)]
    out = pd.DataFrame({"feature": VOCAB + ["__bias"], "weight": w})
    out["weight"] = out["weight"].astype("int64")
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "src/test/resources/graft/linear_weights_sf001.parquet")
    out.to_parquet(dest, index=False)
    n_err = sum(1 for y, x in rows
                if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0)
    print(f"wrote {dest}; final misclassified {n_err}/{len(rows)}")
    print(out.to_string(index=False))


if __name__ == "__main__":
    main()
