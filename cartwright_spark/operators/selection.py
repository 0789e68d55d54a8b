"""Greedy maximum-coverage corpus selection.

Pick k documents that together cover as much of the corpus vocabulary
as possible — the classic submodular-maximization greedy (Nemhauser et
al. 1978: each round take the document with the largest MARGINAL gain;
guaranteed >= (1 - 1/e) of the optimal coverage). The data-curation
use: choosing a small, diverse seed subset (for human review, eval
construction, or active-learning batches) instead of top-k-by-length,
which picks near-duplicates.

Plan shape (the 100 TB audit): the (doc, token) incidence is built
ONCE (one distinct shuffle) and localCheckpoint'ed; each of the k
rounds is one anti-join of the incidence against the covered-token
set plus a count aggregation (partial map-side), then a 1-row argmax
collect. Greedy's k sequential corpus passes are inherent to the
algorithm (each round's gains depend on the previous pick); the
anti-join probe side (covered tokens) only ever grows to |vocabulary|,
and the incidence never rebuilds. Deterministic tie-break:
(gain DESC, doc_id ASC), total order — engine and oracle pick
identical subsets.

Early stop: when no document has positive marginal gain (everything
is covered), remaining rounds emit nothing — matching the oracle,
whose per-round argmax block is empty then.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def greedy_max_coverage(df: DataFrame, k: int = 6,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        gram_n: int = 1) -> DataFrame:
    """-> (step, doc_id, gain, covered_total): the k greedily-selected
    documents in pick order; `gain` is the marginal number of new
    vocabulary units, `covered_total` the running covered-vocabulary
    size after the pick. The vocabulary unit is the word ``gram_n``-gram
    (the Jaccard family's shared tokenization, dedup._word_gram_sets) —
    use n >= 2 when the unigram vocabulary is too small to
    discriminate documents."""
    if k < 1:
        raise ValueError("greedy_max_coverage: k must be >= 1")
    from cartwright_spark.operators.dedup import _word_gram_sets
    spark = df.sparkSession
    toks = (_word_gram_sets(df, text_col, id_col, gram_n)
            .select("id", F.explode("grams").alias("tok"))
            .where(F.col("tok") != "")
            .localCheckpoint(eager=True))       # incidence built once

    covered = None
    picked: list = []
    rows = []
    covered_total = 0
    for step in range(1, k + 1):
        marg = toks
        if picked:
            marg = marg.where(~F.col("id").isin(picked))
        if covered is not None:
            marg = marg.join(covered, "tok", "left_anti")
        best = (marg.groupBy("id").agg(F.count("*").alias("gain"))
                .orderBy(F.desc("gain"), "id")
                .limit(1).collect())            # 1 row — metadata scale
        if not best:
            break
        doc, gain = best[0]["id"], int(best[0]["gain"])
        picked.append(doc)
        new_toks = toks.where(F.col("id") == doc).select("tok")
        covered = (new_toks if covered is None
                   else covered.unionByName(new_toks).distinct()
                   ).localCheckpoint(eager=True)
        covered_total += gain
        rows.append((step, doc, gain, covered_total))

    id_type = dict(df.dtypes)[id_col]
    return spark.createDataFrame(
        rows, f"step int, doc_id {id_type}, gain bigint, "
              f"covered_total bigint")
