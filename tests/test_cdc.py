"""cdc_chunks / cdc_dedup_stats: reference parity, determinism,
duplicate detection, max_len cap."""

import hashlib

import numpy as np

from cartwright_spark.operators.cdc import (DIV, M, P, WIN, cdc_chunks,
                                            cdc_dedup_stats)


def _ref_chunks(text, max_len=2000):
    text = text[:max_len]
    pws, pw = [], 1
    for _ in range(len(text)):
        pw = (pw * P) % M
        pws.append(pw)
    pref = [0]
    for i, ch in enumerate(text):
        pref.append(pref[-1] + (ord(ch) * pws[i]) % M)
    chunks, cur = [], []
    for k in range(1, len(text) + 1):
        cur.append(text[k - 1])
        if k >= WIN and ((pref[k] - pref[k - WIN]) % M) % DIV == 0:
            chunks.append("".join(cur))
            cur = []
    if cur:
        chunks.append("".join(cur))
    return chunks


def _got(spark, texts, max_len=2000):
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    out = {}
    for r in cdc_chunks(df, max_len=max_len).collect():
        out.setdefault(r.doc_id, {})[r.chunk_id] = (r.n_chars,
                                                    r.chunk_hash)
    return {d: [v[i] for i in sorted(v)] for d, v in out.items()}


def test_chunks_match_reference(spark):
    rng = np.random.default_rng(13)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox"]
    texts = {i: " ".join(words[j] for j in rng.integers(0, 6, 80))
             for i in range(6)}
    texts[9] = "tiny"  # shorter than the window: one chunk
    got = _got(spark, texts)
    for d, t in texts.items():
        want = [(len(c), hashlib.md5(c.encode()).hexdigest())
                for c in _ref_chunks(t)]
        assert got[d] == want, d
    assert len(got[9]) == 1


def test_identical_docs_chunk_identically_and_dedup(spark):
    base = "the quick brown fox jumps over the lazy dog " * 12
    texts = {1: base, 2: base, 3: "x" + base}  # 3 re-chunks (no claim)
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    stats = cdc_dedup_stats(df).collect()
    g = _got(spark, texts)
    assert g[1] == g[2]
    # every chunk of doc 1 appears >= twice in the inventory
    hashes = {h for _, h in g[1]}
    found = {r.chunk_hash for r in stats}
    assert hashes <= found
    assert all(r.n_docs >= 2 for r in stats if r.chunk_hash in hashes)


def test_max_len_cap(spark):
    long = "abcdefghij" * 500  # 5000 chars
    got = _got(spark, {1: long}, max_len=100)
    assert sum(n for n, _ in got[1]) == 100
    want = [(len(c), hashlib.md5(c.encode()).hexdigest())
            for c in _ref_chunks(long, 100)]
    assert got[1] == want
