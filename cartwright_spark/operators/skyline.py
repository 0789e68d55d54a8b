"""2-D skyline (Pareto front) per group — the multi-criteria filter
behind "keep documents no other document beats on BOTH quality and
brevity" style curation decisions.

A row (x, y) is ON the front iff no other row in its group has
(x' >= x AND y' >= y) with at least one strict — both criteria
maximized. Duplicate (x, y) rows: exactly one survives (first by the
deterministic id tie-break), matching the set semantics a curation
filter wants.

Reference scope note: jataware/cartwright has no ranking/dominance
layer; this is engine scope from the brief's training-data-pipeline
tier (quality-vs-cost frontier selection).

Spark-first shape — the O(n log n) sweep as ONE window, no self-join:
sort each group by (x DESC, y DESC, id) and keep a row iff its y
strictly exceeds the running max-y of all PRECEDING rows. Preceding
rows have x >= current x (and, on x ties, y >= current y), so the
running max-y is exactly "the best y among rows that weakly beat me on
x" — y must beat it or the row is dominated. The first row of a group
(no preceding) is always on the front.

Scale shape: one hash exchange on the group key + an in-partition
sort. No join, no explode; group skew is a sort-size problem (a J9
salted two-pass would apply past ~10^8 rows per group — the front of
a union of salted fronts is the front, since dominance is transitive,
so a pre-pass per salt shard discards almost everything before the
global window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_front(df: DataFrame, group_col: str = "grp",
                 x_col: str = "x", y_col: str = "y",
                 id_col: str = "id") -> DataFrame:
    """-> the input rows (grp, id, x, y) on the maximize-(x, y) Pareto
    front of their group, exact dominance over any orderable types."""
    w = (Window.partitionBy("grp")
         .orderBy(F.col("x").desc(), F.col("y").desc(), F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    return (df.select(F.col(group_col).alias("grp"),
                      F.col(id_col).alias("id"),
                      F.col(x_col).alias("x"), F.col(y_col).alias("y"))
            .withColumn("_by", F.max("y").over(w))
            .where(F.col("_by").isNull() | (F.col("y") > F.col("_by")))
            .drop("_by"))
