"""Dedup + similarity-search operators vs exact oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cartwright_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dups,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from cartwright_spark.operators.simsearch import brute_force_topk, lsh_bucketed_topk

_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
          "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def _doc(rng, n=60):
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(17)
    texts = []
    for i in range(60):
        t = _doc(rng)
        texts.append((2 * i, t))
        if i < 20:  # near-dup: change one word
            words = t.split()
            words[5] = "zulu"
            texts.append((2 * i + 1, " ".join(words)))
        elif i < 30:  # exact dup
            texts.append((2 * i + 1, t))
        else:  # unrelated doc
            texts.append((2 * i + 1, _doc(rng)))
    return spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))


def test_exact_duplicates(docs):
    groups = exact_duplicates(docs, "text", "doc_id").collect()
    assert len(groups) == 10  # ids 40..59 pair range
    assert all(r["n_dups"] == 2 for r in groups)
    kept = dedup_exact(docs, "text", "doc_id")
    assert kept.count() == docs.count() - 10


@pytest.mark.parametrize("impl", ["pandas", "sql"])
def test_minhash_lsh_finds_near_dups(docs, impl):
    from cartwright_spark.operators.dedup import minhash_signatures_sql
    fn = minhash_signatures if impl == "pandas" else minhash_signatures_sql
    sigs = fn(docs, "text", "doc_id", num_perm=64)
    pairs = minhash_lsh_pairs(sigs, bands=16, jaccard_threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # the 20 one-word-changed pairs + 10 exact pairs must be found
    want = {(2 * i, 2 * i + 1) for i in range(30)}
    assert want <= found
    # exact dups estimate 1.0
    exact = [r for r in pairs if (r["id_a"], r["id_b"]) in
             {(2 * i, 2 * i + 1) for i in range(20, 30)}]
    assert all(abs(r["jaccard_est"] - 1.0) < 1e-9 for r in exact)


def test_ngram_jaccard_refine(spark, docs):
    cand = spark.createDataFrame(
        pd.DataFrame({"id_a": [40, 0], "id_b": [41, 3]}))
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, cand, "text", "doc_id", n=3).collect()}
    assert got[(40, 41)] == pytest.approx(1.0)   # exact dup
    assert got[(0, 3)] < 0.5                      # unrelated


@pytest.mark.parametrize("impl", ["pandas", "sql"])
def test_simhash_near_pairs(docs, impl):
    from cartwright_spark.operators.dedup import simhash_sql
    fn = simhash if impl == "pandas" else simhash_sql
    sh = fn(docs, "text", "doc_id")
    pairs = simhash_near_pairs(sh, max_hamming=10, band_bits=16).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    exact_pairs = {(2 * i, 2 * i + 1) for i in range(20, 30)}
    assert exact_pairs <= found  # hamming 0
    ham0 = [r for r in pairs if (r["id_a"], r["id_b"]) in exact_pairs]
    assert all(r["hamming"] == 0 for r in ham0)


def test_embedding_near_dups(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, (v / np.linalg.norm(v)).tolist()))
        w = v + rng.standard_normal(16) * 0.01  # near-dup vector
        rows.append((2 * i + 1, (w / np.linalg.norm(w)).tolist()))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    got = embedding_near_dups(emb, cosine_threshold=0.99, n_planes=6)
    found = {(r["id_a"], r["id_b"]) for r in got.collect()}
    want = {(2 * i, 2 * i + 1) for i in range(40)}
    # LSH blocking: expect high recall of planted near-dup pairs
    assert len(want & found) >= 0.9 * len(want)


@pytest.fixture(scope="module")
def emb(spark):
    # clustered vectors: LSH recall is only meaningful when neighbors are
    # actually close (random gaussians have near-orthogonal "neighbors")
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((20, 32)) * 3
    m = np.concatenate([c + rng.standard_normal((10, 32)) * 0.3
                        for c in centers])
    rows = [(i, v.tolist()) for i, v in enumerate(m)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))


def _oracle_topk(emb_rows, qids, k):
    ids = np.array([r[0] for r in emb_rows])
    m = np.stack([np.array(r[1]) for r in emb_rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = set()
    for q in qids:
        qv = mn[ids == q][0]
        cos = mn @ qv
        order = np.lexsort((ids, -cos))
        for rank, idx in enumerate(order[:k], 1):
            out.add((q, int(ids[idx]), rank))
    return out


def test_brute_force_topk_matches_numpy(emb):
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    got = {(r["qid"], r["neighbor_id"], r["rank"])
           for r in brute_force_topk(emb, q, k=10).collect()}
    assert got == _oracle_topk(rows, range(5), 10)


def test_lsh_topk_high_recall(emb):
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    got = {(r["qid"], r["neighbor_id"])
           for r in lsh_bucketed_topk(emb, q, k=5, n_planes=5, multiprobe=1).collect()}
    want = {(a, b) for a, b, _ in _oracle_topk(rows, range(10), 5)}
    recall = len(got & want) / len(want)
    assert recall >= 0.6  # approximate path; brute force is the exact baseline


# ---------------------------------------------------------------------------
# contract-fixture recall gates (VERDICT r1 item 7): the ANN paths used by
# the golden contract queries must hold ≥0.9 recall vs their exact
# counterparts on the exact fixture + parameters the contract runs
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def contract_emb(spark):
    from cartwright_spark.sources.fixtures import fixture_embeddings_pdf
    return spark.createDataFrame(fixture_embeddings_pdf()).coalesce(4)


def test_contract_ann_topk_recall(contract_emb):
    q = contract_emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    exact = {(r["qid"], r["neighbor_id"])
             for r in brute_force_topk(contract_emb, q, k=5).collect()}
    ann = {(r["qid"], r["neighbor_id"])
           for r in lsh_bucketed_topk(contract_emb, q, k=5, n_planes=6,
                                      multiprobe=3, dim=32).collect()}
    assert len(ann & exact) / len(exact) >= 0.9


def test_cosine_pairs_blocked_matches_broadcast(spark):
    """The block-pair grouped strategy (no driver collect) is result-
    identical to the broadcast-matrix strategy on the same input."""
    from cartwright_spark.operators.simsearch import cosine_threshold_pairs
    rng = np.random.default_rng(1)
    n, d = 2000, 32
    V = rng.standard_normal((n, d))
    V[100:150] = V[:50] + 0.05 * rng.standard_normal((50, d))  # planted pairs
    emb = spark.createDataFrame(pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": [v.tolist() for v in V]})) \
        .repartition(8).cache()
    a = {(r["id_a"], r["id_b"])
         for r in cosine_threshold_pairs(emb, 0.8).collect()}
    b = {(r["id_a"], r["id_b"])
         for r in cosine_threshold_pairs(emb, 0.8, broadcast_max_rows=0,
                                         block_rows=300).collect()}
    emb.unpersist()
    assert a == b
    assert {(i, 100 + i) for i in range(50)} <= a


def test_cosine_pairs_50k_no_driver_collect(spark):
    """Scale gate (VERDICT r1 item 3): exact all-pairs at 50k vectors runs
    through the block-pair path — no corpus collect on the driver — and
    finds the planted near-dup pairs."""
    from cartwright_spark.operators.simsearch import cosine_threshold_pairs
    rng = np.random.default_rng(2)
    n, d = 50_000, 16
    V = rng.standard_normal((n, d))
    V[40_000:40_100] = V[:100] + 0.02 * rng.standard_normal((100, d))
    emb = spark.createDataFrame(pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": [v.tolist() for v in V]})) \
        .repartition(32).cache()
    try:
        got = {(r["id_a"], r["id_b"])
               for r in cosine_threshold_pairs(
                   emb, 0.95, broadcast_max_rows=0).collect()}
    finally:
        emb.unpersist()
    assert {(i, 40_000 + i) for i in range(100)} <= got


def test_contract_ivf_topk_recall(contract_emb):
    from cartwright_spark.operators.simsearch import ivf_topk
    q = contract_emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    exact = {(r["qid"], r["neighbor_id"])
             for r in brute_force_topk(contract_emb, q, k=5).collect()}
    ann = {(r["qid"], r["neighbor_id"])
           for r in ivf_topk(contract_emb, q, k=5, n_centroids=16,
                             nprobe=4).collect()}
    # nprobe/n_centroids = 25% of the corpus scanned; measured 0.95 here
    assert len(ann & exact) / len(exact) >= 0.9


def test_ivf_clustered_high_recall_low_probe(spark, emb):
    """On a clustered corpus (the realistic case) IVF reaches full recall
    probing 2 of 16 centroids (12.5% scanned)."""
    from cartwright_spark.operators.simsearch import ivf_topk
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    got = {(r["qid"], r["neighbor_id"])
           for r in ivf_topk(emb, q, k=5, n_centroids=16, nprobe=2).collect()}
    want = {(a, b) for a, b, _ in _oracle_topk(rows, range(10), 5)}
    assert len(got & want) / len(want) >= 0.9


def test_contract_near_dup_recall_and_precision(contract_emb):
    from cartwright_spark.operators.simsearch import cosine_threshold_pairs
    exact = {(r["id_a"], r["id_b"])
             for r in cosine_threshold_pairs(contract_emb, 0.8).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in embedding_near_dups(contract_emb, "vec_id", "embedding",
                                        cosine_threshold=0.8, n_planes=4,
                                        dim=32).collect()}
    assert lsh <= exact                      # exact-cosine refine ⇒ no FPs
    assert len(lsh) / len(exact) >= 0.9      # bucket blocking recall


def test_minhash_dedup_assign_megacluster_linear(spark):
    """The assignment path: a near-dup megacluster resolves to one keeper
    with LINEAR output (n rows, never Θ(cluster²) pairs), uniques keep
    themselves, and cluster partitions agree with the connected
    components of the pairs operator's graph."""
    from cartwright_spark.operators.dedup import (minhash_dedup_assign,
                                                  minhash_lsh_pairs,
                                                  minhash_signatures)
    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen engineers review a distributed query plan "
            "for correctness and sustained shuffle throughput")
    rows = []
    for i in range(150):          # megacluster: one appended token each
        rows.append({"doc_id": i, "text": base + f" zq{i}"})
    for i in range(150, 250):     # uniques: unrelated texts
        rows.append({"doc_id": i,
                     "text": " ".join(f"tok{i}_{j}" for j in range(40))})
    docs = spark.createDataFrame(pd.DataFrame(rows)).repartition(8)
    sigs = minhash_signatures(docs, "text", "doc_id", num_perm=64) \
        .localCheckpoint(eager=True)

    assign = minhash_dedup_assign(sigs, bands=16, jaccard_threshold=0.7)
    apdf = assign.toPandas().set_index("id")["keeper_id"].sort_index()
    assert len(apdf) == 250                       # linear: one row per doc
    # every cluster member maps to the cluster min (0); every unique to
    # itself
    assert (apdf.loc[0:149] == 0).all()
    assert (apdf.loc[150:249] == np.arange(150, 250)).all()

    # partition equivalence vs the pairs graph's connected components
    pairs = minhash_lsh_pairs(sigs, bands=16, jaccard_threshold=0.7) \
        .select("id_a", "id_b").toPandas()
    parent = {i: i for i in range(250)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs.itertuples(index=False):
        parent[find(a)] = find(b)
    cc = {i: find(i) for i in range(250)}
    got_parts = {}
    for i, kp in apdf.items():
        got_parts.setdefault(kp, set()).add(i)
    want_parts = {}
    for i, r in cc.items():
        want_parts.setdefault(r, set()).add(i)
    assert set(map(frozenset, got_parts.values())) == \
        set(map(frozenset, want_parts.values()))


# --- deletion_join (SymSpell edit-distance self-join) ------------------


def _lev(a: str, b: str) -> int:
    """Textbook unit-cost Levenshtein (insert/delete/substitute)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_DJ_VOCAB = ["spark", "spars", "sparkk", "park", "spork", "stork",
             "stack", "stuck", "track", "a", "b", "ab", "ba",
             "query", "queue", "quarry", "merge", "marge", "marge"]


def _brute_pairs(vocab, k):
    vs = sorted(set(vocab))
    out = set()
    for i, x in enumerate(vs):
        for y in vs[i + 1:]:
            d = _lev(x, y)
            if d <= k:
                out.add((x, y, d))
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_deletion_join_matches_bruteforce(spark, k):
    from cartwright_spark.operators.fuzzyjoin import deletion_join
    df = spark.createDataFrame([(t,) for t in _DJ_VOCAB], ["term"])
    got = {(r.term_a, r.term_b, r.dist)
           for r in deletion_join(df, "term", k=k).collect()}
    assert got == _brute_pairs(_DJ_VOCAB, k)


def test_deletion_join_dedups_input_multiplicity(spark):
    # corpus multiplicity must not multiply output pairs
    from cartwright_spark.operators.fuzzyjoin import deletion_join
    df = spark.createDataFrame([(t,) for t in _DJ_VOCAB * 7], ["term"])
    out = deletion_join(df, "term", k=1).collect()
    assert len(out) == len({(r.term_a, r.term_b) for r in out})
    assert {(r.term_a, r.term_b, r.dist) for r in out} == \
        _brute_pairs(_DJ_VOCAB, 1)


def test_deletion_join_random_alphabet_bruteforce(spark):
    # dense random 3-letter-alphabet vocab: lots of cross-length pairs,
    # transposition-shaped D1xD1 candidates that must be refined OUT
    from cartwright_spark.operators.fuzzyjoin import deletion_join
    rng = np.random.default_rng(41)
    vocab = list({"".join("abc"[i] for i in rng.integers(0, 3, n))
                  for n in rng.integers(1, 7, 120)})
    df = spark.createDataFrame([(t,) for t in vocab], ["term"])
    got = {(r.term_a, r.term_b, r.dist)
           for r in deletion_join(df, "term", k=2).collect()}
    assert got == _brute_pairs(vocab, 2)


def test_deletion_join_min_len_and_guards(spark):
    from cartwright_spark.operators.fuzzyjoin import deletion_join
    df = spark.createDataFrame([("a",), ("ab",), ("abc",), (None,)],
                               ["term"])
    out = {(r.term_a, r.term_b) for r in
           deletion_join(df, "term", k=1, min_len=2).collect()}
    assert out == {("ab", "abc")}  # "a" gated, None dropped
    with pytest.raises(ValueError):
        deletion_join(df, "term", k=3)
    with pytest.raises(ValueError):
        deletion_join(df, "term", k=1, min_len=0)


# --- prefix_jaccard_join (exact AllPairs similarity self-join) ----------


def _gram_set(text: str, n: int = 3) -> frozenset:
    ws = __import__("re").split(r"\s+", text.lower())
    m = max(len(ws) - n, 0) + 1
    return frozenset(" ".join(ws[i:i + n]) for i in range(m))


def _brute_jaccard(texts, t, n=3):
    out = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        ga = _gram_set(texts[a], n)
        for b in ids[i + 1:]:
            gb = _gram_set(texts[b], n)
            inter = len(ga & gb)
            union = max(len(ga | gb), 1)
            if inter / union >= t:
                out[(a, b)] = (inter, len(ga) + len(gb) - inter,
                               inter / union)
    return out


@pytest.fixture(scope="module")
def pj_corpus(spark):
    rng = np.random.default_rng(23)
    texts = {}
    for i in range(40):
        t = _doc(rng, 30)
        texts[3 * i] = t
        ws = t.split()
        ws[7] = "zulu"                       # near dup
        texts[3 * i + 1] = " ".join(ws)
        texts[3 * i + 2] = t                 # exact dup
    texts[998] = "tiny"                      # < n words
    texts[999] = "tiny doc"
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    return df, texts


@pytest.mark.parametrize("t", [0.3, 0.5, 0.8, 1.0])
def test_prefix_jaccard_matches_bruteforce(pj_corpus, t):
    from cartwright_spark.operators.dedup import prefix_jaccard_join
    df, texts = pj_corpus
    got = {(r.id_a, r.id_b): (r.inter, r.union_sz, r.jaccard)
           for r in prefix_jaccard_join(df, threshold=t).collect()}
    want = _brute_jaccard(texts, t)
    assert set(got) == set(want)
    for k, (i1, u1, j1) in want.items():
        i2, u2, j2 = got[k]
        assert (i2, u2) == (i1, u1)
        assert j2 == pytest.approx(j1, abs=1e-12)


def test_prefix_jaccard_ieee_ceil_slack(spark):
    # L=20 words, t=0.7: 0.7*20 = 14.000000000000002 in IEEE — a naive
    # ceil gives 15, shrinking the prefix below the completeness bound.
    from cartwright_spark.operators.dedup import prefix_jaccard_join
    base = [f"w{i}" for i in range(22)]
    a = " ".join(base)          # 20 distinct 3-grams
    mut = list(base); mut[0] = "zz"
    b = " ".join(mut)           # shares grams 4..20 (17 of 23 union)
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    want = _brute_jaccard({1: a, 2: b}, 0.7)
    got = {(r.id_a, r.id_b) for r in
           prefix_jaccard_join(df, threshold=0.7).collect()}
    assert got == set(want)


def test_prefix_jaccard_guards(spark):
    from cartwright_spark.operators.dedup import prefix_jaccard_join
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            prefix_jaccard_join(df, threshold=bad)


# --- containment_join (exact asymmetric all-pairs self-join) -------------


def _brute_containment(texts, t, n=3):
    out = {}
    ids = sorted(texts)
    for a in ids:
        ga = _gram_set(texts[a], n)
        if not ga:
            continue
        for b in ids:
            if a == b:
                continue
            gb = _gram_set(texts[b], n)
            inter = len(ga & gb)
            if inter / len(ga) >= t:
                out[(a, b)] = (inter, len(ga), inter / len(ga))
    return out


@pytest.mark.parametrize("t", [0.3, 0.5, 0.8, 1.0])
def test_containment_matches_bruteforce(pj_corpus, t):
    from cartwright_spark.operators.dedup import containment_join
    df, texts = pj_corpus
    got = {(r.id_a, r.id_b): (r.inter, r.size_a, r.containment)
           for r in containment_join(df, threshold=t).collect()}
    want = _brute_containment(texts, t)
    assert set(got) == set(want)
    for k, (i1, s1, c1) in want.items():
        i2, s2, c2 = got[k]
        assert (i2, s2) == (i1, s1)
        assert c2 == pytest.approx(c1, abs=1e-12)


def test_containment_is_asymmetric(spark):
    """A short doc embedded verbatim in a long one: C(short->long)=1.0
    even though Jaccard is far below threshold — the quote/mirror case
    the operator exists for."""
    from cartwright_spark.operators.dedup import containment_join
    short = "alpha bravo charlie delta echo"
    filler = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, short), (2, filler + " " + short + " " + filler)],
        ["doc_id", "text"])
    rows = {(r.id_a, r.id_b): r.containment
            for r in containment_join(df, threshold=0.9).collect()}
    assert rows == {(1, 2): pytest.approx(1.0)}


def test_containment_guards(spark):
    from cartwright_spark.operators.dedup import containment_join
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            containment_join(df, threshold=bad)
