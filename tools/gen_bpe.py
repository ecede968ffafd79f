#!/usr/bin/env python3
"""Dev-only BPE trainer + independent oracle encoder.

NOT part of the engine. Produces two checked-in artifacts:
  1. src/main/resources/graft/bpe/merges.txt — the fixed merge table
     the Scala encoder (graft.ns.Bpe) applies at query time.
  2. src/test/resources/graft/bpe_oracle_sf001.parquet — the expected
     (doc_id, pos, token_id) stream for sf0.01 docs with doc_id < 100,
     encoded by THIS INDEPENDENT Python implementation. The driver's
     ns61 oracle SQL reads this table, so the gate proves the Scala
     and Python encoders agree bit-for-bit on real fixture text.

Training: classic BPE (Sennrich et al. 2016, public) — iteratively
replace the most frequent adjacent symbol pair; ties break on the
lexicographically smallest (a, b). Deterministic by construction.

Canonicalization/pre-tokenization mirror graft.ns.Bpe.norm/preTokens
exactly (ASCII \\s classes, space-only trim, ROOT lowercase).

Usage: python3 tools/gen_bpe.py [SF_DIR] [N_MERGES]
Rerun (and recommit both artifacts) if the driver regenerates the
documents fixture with different text — BpeFixturePinSpec fails
loudly when that happens.
"""
import re
import sys
from collections import Counter

import duckdb
import pandas as pd

ASCII_WS = r"[ \t\n\x0b\f\r]+"
PRE_TOKEN = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]", re.ASCII)
# byte-fallback pre-tokenizer (r14): whitespace runs are pre-tokens
# too, so decode∘encode reproduces canonical text exactly
PRE_TOKEN_BF = re.compile(r"[a-z]+|[0-9]+|\s+|[^a-z0-9\s]", re.ASCII)


def norm(s: str) -> str:
    return re.sub(ASCII_WS, " ", s.strip(" ").lower(), flags=re.ASCII)


def pre_tokens(normed: str):
    return PRE_TOKEN.findall(normed)


def pre_tokens_bf(normed: str):
    return PRE_TOKEN_BF.findall(normed)


def train(word_freq: Counter, n_merges: int):
    seqs = {w: tuple(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in seqs.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_seqs = {}
        for w, syms in seqs.items():
            out, k = [], 0
            while k < len(syms):
                if k < len(syms) - 1 and syms[k] == a and syms[k + 1] == b:
                    out.append(ab)
                    k += 2
                else:
                    out.append(syms[k])
                    k += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges


def make_ids(merges):
    ids = {"<unk>": 0}
    for i, cp in enumerate(range(0x21, 0x7F)):
        ids[chr(cp)] = i + 1
    for k, (a, b) in enumerate(merges):
        ids[a + b] = 95 + k
    return ids


def merge_syms(word, ranks):
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        a, b = syms[best_i], syms[best_i + 1]
        out, k = [], 0
        while k < len(syms):
            if k < len(syms) - 1 and syms[k] == a and syms[k + 1] == b:
                out.append(a + b)
                k += 2
            else:
                out.append(syms[k])
                k += 1
        syms = out
    return syms


def encode_word(word, ranks, ids):
    return [ids.get(s, 0) for s in merge_syms(word, ranks)]


def encode_word_bf(word, ranks, ids, byte_base):
    """Byte fallback: a symbol outside the vocab decomposes into its
    UTF-8 bytes' tokens (ids byte_base..byte_base+255) — never unk."""
    out = []
    for s in merge_syms(word, ranks):
        if s in ids:
            out.append(ids[s])
        else:
            out.extend(byte_base + b for b in s.encode("utf-8"))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id").df()

    wf = Counter()
    for t in docs.text:
        wf.update(pre_tokens(norm(t)))
    merges = train(wf, n_merges)
    with open("src/main/resources/graft/bpe/merges.txt", "w") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")
    # ranked-parquet twin of merges.txt: the ns88 learnMerges gate
    # reads this via the oracle SQL (rank order is the claim)
    pd.DataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        columns=["rank", "left", "right"]).astype({"rank": "int64"}) \
        .to_parquet("src/test/resources/graft/bpe_merges_sf001.parquet",
                    index=False)
    print(f"wrote {len(merges)} merges "
          f"({len(wf)} distinct pre-tokens in corpus)")

    ranks = {p: i for i, p in enumerate(merges)}
    ids = make_ids(merges)
    rows = []
    for r in docs[docs.doc_id < 100].itertuples():
        pos = 0
        for w in pre_tokens(norm(r.text)):
            for tid in encode_word(w, ranks, ids):
                rows.append((r.doc_id, pos, tid))
                pos += 1
    oracle = pd.DataFrame(rows, columns=["doc_id", "pos", "token_id"]) \
        .astype("int64")
    out = "src/test/resources/graft/bpe_oracle_sf001.parquet"
    oracle.to_parquet(out, index=False)
    print(f"wrote {len(oracle)} oracle rows -> {out}")
    # quick stats for the commit message / sanity
    n_tok = oracle.groupby("doc_id").size()
    print(f"tokens/doc min={n_tok.min()} mean={n_tok.mean():.1f} "
          f"max={n_tok.max()}; vocab={len(ids)}")

    # 2b. byte-fallback oracle (r14): the same doc_id < 100 slice with
    # the ns187 planted non-ASCII tail (" é μ" for doc_id % 9 == 0),
    # encoded with whitespace pre-tokens + byte fallback — the id
    # stream the ns190 gate compares rank-for-rank. byte_base is a
    # pure function of the merge table: 95 + len(merges).
    byte_base = 95 + len(merges)
    bf_rows = []
    for r in docs[docs.doc_id < 100].itertuples():
        text = r.text + (" é μ" if r.doc_id % 9 == 0 else "")
        pos = 0
        for w in pre_tokens_bf(norm(text)):
            for tid in encode_word_bf(w, ranks, ids, byte_base):
                bf_rows.append((r.doc_id, pos, tid))
                pos += 1
    bf = pd.DataFrame(bf_rows, columns=["doc_id", "pos", "token_id"]) \
        .astype("int64")
    bf_out = "src/test/resources/graft/bpe_bf_oracle_sf001.parquet"
    bf.to_parquet(bf_out, index=False)
    n_byte = (bf.token_id >= byte_base).sum()
    n_unk = (bf.token_id == 0).sum()
    print(f"wrote {len(bf)} bf oracle rows -> {bf_out} "
          f"(byte_base={byte_base}, byte_tokens={n_byte}, unk={n_unk})")
    assert n_unk == 0, "byte fallback must never emit unk"

    # 3. SFT oracle: the chat fixture's conversations (doc_id < 100,
    # %17 != 0 — truncated lines quarantine and carry no turns),
    # re-rendered and re-encoded by THIS independent implementation.
    # Turn template mirrors graft.ns.Posttrain.sftTokenMask:
    # <|role|>content<|end|>; content is the chat fixture's canonical
    # first-3-words stripped to [a-z0-9 ] (SparkEntry.chatJsonlLines).
    # pos is WITHIN-turn — the oracle SQL replays the cross-turn
    # offset prefix sum, mirroring the engine's window.
    sft_rows = []
    for r in docs[docs.doc_id < 100].itertuples():
        if r.doc_id % 17 == 0:
            continue
        toks = norm(r.text).split(" ")
        content = re.sub(r"[^a-z0-9 ]", "", " ".join(toks[:3]))
        turns = [("user", content), ("assistant", f"ok {r.doc_id}")]
        for turn_idx, (role, text) in enumerate(turns):
            pos = 0
            for w in pre_tokens(norm(f"<|{role}|>{text}<|end|>")):
                for tid in encode_word(w, ranks, ids):
                    sft_rows.append((r.doc_id, turn_idx, role, pos, tid))
                    pos += 1
    sft = pd.DataFrame(
        sft_rows,
        columns=["conversation_id", "turn_idx", "role", "pos",
                 "token_id"]).astype(
        {"conversation_id": "int64", "turn_idx": "int64",
         "pos": "int64", "token_id": "int64"})
    sft_out = "src/test/resources/graft/sft_oracle_sf001.parquet"
    sft.to_parquet(sft_out, index=False)
    print(f"wrote {len(sft)} sft oracle rows -> {sft_out} "
          f"({sft.conversation_id.nunique()} conversations)")


if __name__ == "__main__":
    main()
