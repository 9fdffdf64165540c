"""Custom aggregate surface (SURVEY.md §2.8 — AggregateRegistry parity).

The reference allows registering custom SPARQL aggregates by IRI
(sparql/expr/aggregate/AggregateRegistry.java).  Our surface is a
name→callable registry of Arrow-batched ``pandas_udf`` GROUPED_AGG
functions — vectorized, JVM↔Python via Arrow, usable directly inside
``groupBy().agg()``.
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

_REGISTRY: Dict[str, Callable] = {}


def register(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


def get(name: str) -> Callable:
    return _REGISTRY[name]


# ---------------------------------------------------------------------------
# built-in examples
# ---------------------------------------------------------------------------

@pandas_udf(DoubleType())
def gini(v: pd.Series) -> float:
    """Gini coefficient of a numeric column per group — the long-tail
    skew diagnostic for the predicate histogram (which keys to salt)."""
    import numpy as np

    x = np.sort(v.dropna().to_numpy(dtype="float64"))
    n = len(x)
    if n == 0:
        return float("nan")
    total = x.sum()
    if total == 0:
        return 0.0
    i = np.arange(1, n + 1)
    return float(2.0 * (i * x).sum() / (n * total) - (n + 1.0) / n)


@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    import numpy as np

    x = v.dropna().to_numpy(dtype="float64")
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x).mean()))


register("gini", gini)
register("geometric_mean", geometric_mean)


def predicate_skew(triples, pred_col: str = "pred"):
    """Skew report over the predicate histogram: count per predicate plus
    the overall gini — the evidence feed for salting decisions."""
    hist = triples.groupBy(pred_col).agg(F.count("*").alias("n"))
    # pandas GROUPED_AGG UDFs cannot mix with built-in aggregates in one
    # agg() — compute separately and cross-join the two single-row frames
    basic = hist.agg(
        F.count("*").alias("n_predicates"),
        F.max("n").alias("max_rows"),
        F.expr("percentile_approx(n, 0.5)").alias("median_rows"),
    )
    g = hist.agg(gini(F.col("n").cast("double")).alias("gini"))
    return basic.crossJoin(g)
