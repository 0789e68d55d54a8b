"""Geofence transition detection: per (entity, fence) enter/exit
events from a position stream — the alerting primitive on top of the
trajectory tier (stay_points finds dwells, this finds crossings).

Fences are circles on the caller's planar integer grid, so membership
is the EXACT int64 predicate (x-cx)^2 + (y-cy)^2 <= r^2 — no floats,
no haversine ambiguity; for geographic data the caller projects first
(functions/geodesy.py) or uses the PIP layer for polygon fences.

Scale shape: the fence table is a BROADCAST dim (fences are
thousands, positions are billions) exploded onto every point map-side;
the only exchange is the window on (entity, fence) that lags the
membership flag to find 0->1 / 1->0 edges. Transition output is
bounded by actual crossings, not by |points| x |fences|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def geofence_transitions(points: DataFrame, fences: DataFrame,
                         entity_col: str = "entity",
                         order_cols: list | None = None,
                         x_col: str = "x", y_col: str = "y"
                         ) -> DataFrame:
    """``points``: (entity, order cols..., x, y) integer coords;
    ``fences``: (fence_id, cx, cy, r). -> one row per membership
    change: (entity, fence_id, order cols..., x, y, inside, event)
    with event 'enter' (0->1) or 'exit' (1->0); the first observation
    of an entity inside a fence counts as an enter."""
    order_cols = list(order_cols or ["ts"])
    dx = F.col(x_col).cast("bigint") - F.col("cx")
    dy = F.col(y_col).cast("bigint") - F.col("cy")
    inside = (dx * dx + dy * dy
              <= F.col("r").cast("bigint") * F.col("r")).cast("int")
    tagged = (points.crossJoin(
        F.broadcast(fences.select("fence_id", "cx", "cy", "r")))
        .withColumn("inside", inside))
    w = Window.partitionBy(entity_col, "fence_id").orderBy(*order_cols)
    out = (tagged
           .withColumn("__prev", F.lag("inside").over(w))
           .where((F.col("__prev").isNull() & (F.col("inside") == 1))
                  | (F.col("__prev").isNotNull()
                     & (F.col("__prev") != F.col("inside"))))
           .withColumn("event",
                       F.when(F.col("inside") == 1,
                              F.lit("enter")).otherwise(F.lit("exit"))))
    return out.select(entity_col, "fence_id", *order_cols,
                      x_col, y_col, "inside", "event")
