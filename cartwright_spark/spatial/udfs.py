"""Arrow-batched UDF wrappers around the spatial kernels."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from cartwright_spark.spatial import s2 as _s2


def s2_cell_udf(level: int):
    @pandas_udf("long")
    def f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        import numpy as np
        cid = _s2.latlng_to_cell(lat.to_numpy(np.float64), lon.to_numpy(np.float64), level)
        return pd.Series(cid.astype(np.int64))  # two's-complement long; order-preserving per face
    return f


def s2_cell(lat: Column, lon: Column, level: int) -> Column:
    return s2_cell_udf(level)(lat, lon)


def s2_parent_col(cell: Column, level: int) -> Column:
    """Parent cell as pure bit arithmetic — no UDF: (id & -lsb) | lsb.
    Level coarsening in joins should use this, never a re-encode."""
    from pyspark.sql import functions as F
    lsb = 1 << (2 * (30 - level))
    return (cell.bitwiseAND(F.lit(-lsb))).bitwiseOR(F.lit(lsb))


def s2_parent(level: int):
    @pandas_udf("long")
    def f(cell: pd.Series) -> pd.Series:
        import numpy as np
        out = _s2.parent(cell.to_numpy(np.int64).astype(np.uint64), level)
        return pd.Series(out.astype(np.int64))
    return f
