"""Vectorized Python UDF surface (SURVEY §2.9 U3): the engine's rule is
builtins first, Arrow-batched pandas UDFs only where Catalyst has no
primitive — never row-at-a-time Python.

`geomean` is the demonstration GROUPED_AGG pandas UDF (no Spark builtin
computes a geometric mean directly); `centroid_per_group` shows the
applyInPandas GROUPED_MAP shape used when the result is per-group
vectors rather than a scalar."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """GROUPED_AGG geometric mean: exp(mean(ln x)) over positive x,
    computed on Arrow batches executor-side."""
    x = v.dropna()
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x.astype("float64")).mean()))


def centroid_per_group(
    df: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """applyInPandas per-group mean vector (GROUPED_MAP): one Arrow
    batch per group, result one row per group. The pure-Catalyst twin
    is `operators.similarity.label_centroids` — tests assert they
    agree."""
    def mean_vec(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].to_numpy())
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "centroid": [mat.astype("float64").mean(axis=0).tolist()],
            }
        )

    return df.select(group_col, vec_col).groupBy(group_col).applyInPandas(
        mean_vec, f"{group_col} long, centroid array<double>"
    )
