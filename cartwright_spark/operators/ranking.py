"""BM25 keyword relevance scoring over an on-the-fly inverted index.

Training-data curation uses keyword relevance both for targeted corpus
slicing ("pull the pages about X") and quality weighting. BM25 (Robertson
et al., public IR literature) over a distributed term index is the
standard shape; this builds it from DataFrame primitives only:

  docs --tokenize--> (doc, term, tf) --prune to query terms-->
       --df per term (broadcast)--> score --sum per doc--> rank

Scale notes (100 TB):
- The query-term IN-filter lands BEFORE the (doc, term) aggregation, so
  the only wide shuffle over corpus-sized data is a groupBy on
  (doc_id, term) restricted to docs that contain a query term.
- Per-term document frequencies and the corpus-level (N, avgdl) scalars
  are metadata-sized and broadcast; nothing corpus-sized is collected.
- Everything is whole-stage-codegen built-ins: split/filter/explode/
  groupBy/log. No Python in the hot path.

Tokenization matches operators/textstats.py's whitespace convention
(split on \\s+, lowercase, drop empties) so scores compose with the
quality/repetition layer.

Reference parity: jataware/cartwright has no retrieval layer; this is
engine scope from the brief's training-data-pipeline axis.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LN2 = math.log(2.0)


def _words(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda w: w != "")


def bm25_scores(docs: DataFrame, terms: list[str], text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """(id_col, n_terms, score) for every document matching ≥1 query term.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)) with the
    +1-smoothed idf = ln(1 + (N - df + 0.5)/(df + 0.5)). `n_terms` is the
    count of distinct query terms present (integer — a float-free rank
    key when callers need deterministic cross-engine ordering)."""
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    base = docs.select(F.col(id_col), _words(text_col).alias("__w")) \
               .withColumn("dl", F.size("__w"))

    # corpus scalars: one metadata-sized agg, broadcast via crossJoin
    stats = base.agg(F.count("*").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))

    tf = (base.select(id_col, "dl", F.explode("__w").alias("term"))
          .where(F.col("term").isin(list(terms)))
          .groupBy(id_col, "dl", "term")
          .agg(F.count("*").alias("tf")))

    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (tf.join(F.broadcast(df_), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    term_score = idf * F.col("tf") * (k1 + 1.0) / denom
    return (scored.withColumn("__s", term_score)
            .groupBy(id_col)
            .agg(F.count("*").alias("n_terms"),
                 F.sum("__s").alias("score")))


def bm25_topk(docs: DataFrame, terms: list[str], topk: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents by BM25 score (ties broken by id ascending).

    The rank is a single window over the MATCHED docs only (already
    pruned to query-term hits), ordered by float score — fine within one
    engine; cross-engine equality tests should compare `bm25_scores`
    directly (see __spark_entry__), since ulp-level log differences can
    legally flip near-tied ranks."""
    s = bm25_scores(docs, terms, text_col, id_col, k1, b)
    # orderBy().limit(k) compiles to TakeOrderedAndProject — per-partition
    # top-k merged at the driver, never a single-task global sort. The
    # rank window then runs over ≤ topk rows.
    top = s.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(topk)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


def hashed_linear_score(docs: DataFrame, dim: int = 1024,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """FastText-style linear classifier inference with feature hashing:
    token → hash bucket → broadcast weight lookup → mean → sigmoid.
    The north star's "vectorized batch scoring" shape as pure built-ins:
    a model is a broadcast (bucket, weight) dim table, inference is an
    equi-join plus one algebraic aggregation — no Python in the hot path
    and nothing corpus-sized ever collected or shuffled wide (the only
    shuffle is the per-doc mean).

    Weights here are derived deterministically from the bucket index (a
    stand-in for trained parameters — swap in a real weights DataFrame of
    the same shape). Output: (id, n_tokens, raw, prob)."""
    from cartwright_spark.operators.sketch import hash32
    spark = docs.sparkSession
    weights = spark.range(dim).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * 2654435761) % 2000003 / 1000001.5 - 1.0)
        .alias("wt"))
    toks = (docs.select(F.col(id_col),
                        F.explode(_words(text_col)).alias("__t"))
            .select(id_col, (hash32(F.col("__t")) % dim).alias("bucket")))
    return (toks.join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("wt").alias("raw"))
            .withColumn("prob",
                        1.0 / (1.0 + F.exp(-(F.col("raw")
                                             / F.col("n_tokens"))))))


def inverted_index(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 1,
                   max_postings: int = 10000) -> DataFrame:
    """Inverted index build: -> (term, df, postings) where df = exact
    distinct-document frequency and postings = the comma-joined sorted
    doc-id list, or NULL for terms with df > ``max_postings``
    (stop-word posting suppression — df stays exact).

    Terms are the same lowercase whitespace words bm25_scores uses, so
    the index and the scorer agree on vocabulary. Postings are emitted
    as a canonical string (sorted, comma-joined) rather than an array —
    engine-portable and hashable.

    Scale shape (the 100 TB audit):
      1. explode -> distinct(term, doc) — ONE corpus shuffle; within-doc
         repeats collapse in the map-side partial dedup, so the exchange
         carries the deduped pair set, not the token stream.
      2. df = groupBy(term) count over pairs — algebraic, map-side
         combine absorbs stop-word skew before the exchange.
      3. postings only for terms passing the df gates: pairs join the
         kept-term dim on term, then sort_array(collect_list) groupBy
         term REUSES the join's hash(term) partitioning (no 4th
         exchange). The collect state is bounded by ``max_postings`` BY
         CONSTRUCTION (gated before the collect, not after), so a
         stop-word can never accumulate an unbounded list.
    """
    min_df = int(min_df)
    max_postings = int(max_postings)
    if max_postings < min_df:
        raise ValueError("inverted_index: max_postings < min_df leaves "
                         "no term eligible for postings")
    pairs = (docs
             .select(F.col(id_col).alias("doc"),
                     F.explode(_words(text_col)).alias("term"))
             .distinct())
    stats = (pairs.groupBy("term")
             .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
             .where(F.col("df") >= F.lit(min_df)))
    kept = stats.where(F.col("df") <= F.lit(max_postings))
    postings = (pairs.join(kept.select("term"), "term")
                .groupBy("term")
                .agg(F.concat_ws(",", F.transform(
                    F.sort_array(F.collect_list("doc")),
                    lambda d: d.cast("string"))).alias("postings")))
    return (stats.join(postings, "term", "left")
            .select("term", "df", "postings"))


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             rank_col: str = "rank", k0: int = 60,
             topk: int = 50) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009): combine
    N independent rankings of the same corpus into one list by
    score(d) = \u03a3_i 1/(k0 + rank_i(d)) \u2014 the standard zero-training way
    to fuse lexical (BM25), link (PageRank) and semantic (ANN) rankers
    in a retrieval pipeline, robust to incomparable score scales
    because only RANKS enter the sum.

    The sum runs in FIXED POINT: each list contributes
    ``10^12 div (k0 + rank)`` (integer division), so scores are exact
    integers \u2014 no float re-association can flip the fused order
    between partitions, runs, or engines (a pair of docs holding the
    same contribution multiset would otherwise sort by 1-ulp noise).
    ``rrf_score_e12`` is the scaled score; divide by 1e12 for the
    textbook value.

    Inputs: each DataFrame carries (id_col, rank_col) with integer
    ranks starting at 1. A document absent from a ranking contributes
    nothing for it (standard RRF). Output: (id, rrf_score_e12,
    n_lists, rrf_rank) for the fused top ``topk``, ranked by
    (score DESC, id ASC).

    Scale shape: a unionByName + ONE algebraic groupBy(id) (map-side
    partials \u2014 a doc appearing in all N lists is N rows, not a join
    fan-out); the global top-k is rank-pruned per partition first, so
    the final single-task window only sees partitions\u00b7topk rows,
    never the corpus."""
    scale = 10 ** 12
    tagged = [r.select(F.col(id_col).alias("id"),
                       F.expr(f"{scale} div ({k0} + {rank_col})")
                       .alias("contrib"))
              for r in rankings]
    allc = tagged[0]
    for t in tagged[1:]:
        allc = allc.unionByName(t)
    fused = (allc.groupBy("id")
             .agg(F.sum("contrib").alias("rrf_score_e12"),
                  F.count(F.lit(1)).alias("n_lists")))
    # per-partition prune: anything below a partition's top-k can never
    # reach the global top-k
    pruned = (fused
              .withColumn("__pos", F.spark_partition_id())
              .withColumn("__rn", F.row_number().over(
                  Window.partitionBy("__pos")
                  .orderBy(F.desc("rrf_score_e12"), F.asc("id"))))
              .where(F.col("__rn") <= topk))
    final = Window.orderBy(F.desc("rrf_score_e12"), F.asc("id"))
    return (pruned.withColumn("rrf_rank", F.row_number().over(final))
            .where(F.col("rrf_rank") <= topk)
            .select(F.col("id").alias(id_col), "rrf_score_e12",
                    "n_lists", "rrf_rank"))


def proximity_pairs(docs: DataFrame, term_a: str, term_b: str,
                    window: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Positional proximity search: per document, count the (i, j)
    token-position pairs where `term_a` sits at i, `term_b` at j, and
    |i - j| <= `window` — the phrase/NEAR operator the positionless
    `inverted_index` cannot answer. -> (doc_id, n_pairs, min_gap) for
    documents with at least one qualifying pair.

    Tokens are the same lowercase whitespace words bm25/inverted_index
    use (positions over the empty-filtered list), so all three agree
    on vocabulary AND offsets.

    Scale shape (the 100 TB audit): the term filter lands right after
    the posexplode, so only the two terms' positions ever reach an
    exchange — corpus-sized token streams never shuffle. The |i-j|
    band is a BINNED equi-join (the J11 range-join trick): bucket
    positions by `window`, probe the a-side into buckets {b-1, b, b+1}
    (3x explode of the already-tiny filtered side), equi-join on
    (doc, bucket), refine exactly — each candidate pair is tested
    exactly once (the b-position owns one bucket), no inequality-join
    blowup, no per-doc quadratic work beyond true matches.
    """
    if term_a == term_b:
        raise ValueError("proximity_pairs needs two distinct terms")
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = (docs
            .select(F.col(id_col).alias("doc"),
                    F.posexplode(_words(text_col)).alias("p0", "w"))
            .select("doc", (F.col("p0") + 1).alias("pos"), "w"))
    a = toks.where(F.col("w") == term_a).select(
        "doc", F.col("pos").alias("pa"))
    b = (toks.where(F.col("w") == term_b)
         .select("doc", F.col("pos").alias("pb"),
                 F.floor(F.col("pos") / window).alias("bk")))
    probes = a.select(
        "doc", "pa",
        F.explode(F.array(*[
            (F.floor(F.col("pa") / window) + F.lit(d)).alias("bk")
            for d in (-1, 0, 1)])).alias("bk"))
    pairs = (probes.join(b, ["doc", "bk"])
             .where(F.abs(F.col("pa") - F.col("pb")) <= window))
    return (pairs.groupBy("doc")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.min(F.abs(F.col("pa") - F.col("pb")))
                 .cast("bigint").alias("min_gap"))
            .select(F.col("doc").alias("doc_id"), "n_pairs", "min_gap"))


def best_snippet(docs: DataFrame, terms: list[str], window: int = 10,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Snippet selection: per document, the token position whose
    ``window``-token span [p, p + window) covers the most query-term
    occurrences — the search-result highlight primitive. Earliest
    position wins ties. -> (doc_id, start_pos, n_hits) for documents
    containing at least one query term.

    The optimal span can be assumed to start AT a query-term hit
    (sliding left to the first covered hit never loses a hit), so the
    candidate set is the hit positions themselves, and the per-
    candidate cover count is ONE logical-range window frame
    (RANGE BETWEEN CURRENT ROW AND window-1 FOLLOWING over the
    position order) — no self-join, no band explode. Tokens are the
    shared bm25/inverted_index vocabulary.

    Scale shape: the term filter lands right after the posexplode, so
    only hit positions shuffle (one doc-key exchange shared by the
    range frame and the arg-max row_number); everything else is
    codegen.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if not terms:
        raise ValueError("terms must be non-empty")
    hits = (docs
            .select(F.col(id_col).alias("doc"),
                    F.posexplode(_words(text_col)).alias("p0", "w"))
            .where(F.col("w").isin(list(terms)))
            .select("doc", (F.col("p0") + 1).alias("pos")))
    frame = (Window.partitionBy("doc").orderBy("pos")
             .rangeBetween(Window.currentRow, window - 1))
    counted = hits.withColumn(
        "n_hits", F.count(F.lit(1)).over(frame).cast("bigint"))
    pick = Window.partitionBy("doc").orderBy(
        F.col("n_hits").desc(), F.col("pos").asc())
    return (counted.withColumn("rn", F.row_number().over(pick))
            .where(F.col("rn") == 1)
            .select(F.col("doc").alias("doc_id"),
                    F.col("pos").cast("bigint").alias("start_pos"),
                    "n_hits"))


def ndcg_at_k(ranked: DataFrame, k: int = 10, qid_col: str = "qid",
              id_col: str = "doc_id", score_col: str = "score",
              rel_col: str = "rel") -> DataFrame:
    """NDCG@k retrieval-quality evaluation (Jarvelin & Kekalainen 2002,
    the standard graded-relevance ranking metric): per query,
    DCG@k = sum_{r<=k} (2^rel - 1) / log2(r + 1) over the system
    ranking (score DESC, id ASC), IDCG@k the same sum over the ideal
    ranking (rel DESC, id ASC), NDCG = DCG / IDCG.
    -> (qid, n_ranked, dcg, idcg, ndcg), one row per query with at
    least one positive-gain candidate in the ideal top-k.

    Exactness: gains 2^rel - 1 are exact BIGINTs via shiftleft (rel is
    guarded to [0, 62] with raise_error — silent overflow would flip
    orderings); the log2 discounts are the single shared expression
    ln(2)/ln(r+1) in both engines, and the <= k-term float sums are
    tolerance-stable under the 6-dp compare.

    Scale shape (the 100 TB audit): the per-query top-k windows are
    rank-pruned per partition FIRST (the rrf_fuse pattern — a row
    below its partition's per-qid top-k can never reach the global
    per-qid top-k), so each final window task sees <= partitions*k
    rows per query, never the corpus; a mega-query with millions of
    candidates costs one partial row_number, not a single-task sort.
    Everything is codegen built-ins; the only exchanges are the two
    qid-keyed window shuffles over pruned rows and one qid groupBy.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q, d, s, rl = qid_col, id_col, score_col, rel_col
    guarded = ranked.withColumn(
        "__rel",
        F.when((F.col(rl) >= 0) & (F.col(rl) <= 62),
               F.col(rl).cast("int"))
        .otherwise(F.raise_error(F.lit(
            "ndcg_at_k: rel outside [0, 62] would overflow the exact "
            "2^rel - 1 BIGINT gain"))))
    gained = guarded.select(
        F.col(q).alias("qid"), F.col(d).alias("id"),
        F.col(s).alias("sc"),
        (F.expr("shiftleft(CAST(1 AS BIGINT), __rel)") - 1)
        .alias("gain"))

    def _topk(df, order):
        pruned = (df.withColumn("__pid", F.spark_partition_id())
                  .withColumn("__prn", F.row_number().over(
                      Window.partitionBy("qid", "__pid").orderBy(*order)))
                  .where(F.col("__prn") <= k))
        return (pruned.withColumn("r", F.row_number().over(
                    Window.partitionBy("qid").orderBy(*order)))
                .where(F.col("r") <= k)
                .withColumn("term",
                            F.col("gain").cast("double")
                            * F.lit(_LN2) / F.log(F.col("r") + 1.0)))

    sys_order = [F.col("sc").desc(), F.col("id").asc()]
    ideal_order = [F.col("gain").desc(), F.col("id").asc()]
    dcg = (_topk(gained, sys_order)
           .groupBy("qid")
           .agg(F.count(F.lit(1)).alias("n_ranked"),
                F.sum("term").alias("dcg")))
    idcg = (_topk(gained, ideal_order)
            .groupBy("qid").agg(F.sum("term").alias("idcg"))
            .where(F.col("idcg") > 0))
    return (dcg.join(idcg, "qid")
            .select("qid", "n_ranked", "dcg", "idcg",
                    (F.col("dcg") / F.col("idcg")).alias("ndcg")))


def tfidf_top_terms(docs: DataFrame, topk: int = 5,
                    text_col: str = "text", id_col: str = "doc_id",
                    min_len: int = 2) -> DataFrame:
    """Per-document characteristic terms: top ``topk`` by
    tf-idf = tf * ln(N / df) -> (doc_id, term, tf, df, tfidf, rank).

    The keyword-extraction baseline the curation tier slices corpora
    with (rake/textrank are graph-weighted alternatives; this is the
    exact counting form). Scale shape: (doc, term, tf) from one
    corpus groupBy; per-term document frequencies are a term-keyed
    dim attached by an equi-join (shuffle join at web scale — the
    vocabulary is not broadcastable; AQE handles hot-term skew); N is
    a one-row broadcast. The per-doc top-k is a row_number window on
    the doc key ordered (tfidf DESC, term ASC) — the tiebreak plus
    the oracle-identical ln(N/df) expression shape make the cut
    deterministic across engines.
    """
    if topk < 1:
        raise ValueError("topk must be >= 1")
    toks = (docs.select(F.col(id_col).alias("d"),
                        F.explode(_words(text_col)).alias("t"))
            .where(F.length("t") >= F.lit(int(min_len))))
    tf = toks.groupBy("d", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfreq, "t")
              .crossJoin(F.broadcast(n))
              .withColumn("tfidf",
                          F.col("tf")
                          * F.log(F.col("n_docs").cast("double")
                                  / F.col("df"))))
    w = Window.partitionBy("d").orderBy(F.col("tfidf").desc(),
                                        F.col("t").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.lit(int(topk)))
            .select(F.col("d").alias(id_col), F.col("t").alias("term"),
                    "tf", "df", "tfidf", "rank"))
