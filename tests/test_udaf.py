import math

import pytest
from pyspark.sql import functions as F

from jena_spark.ops import udaf


def test_registry():
    assert udaf.get("gini") is udaf.gini
    assert udaf.get("geometric_mean") is udaf.geometric_mean


def test_gini_extremes(spark):
    # perfectly equal distribution → gini ~ 0
    eq = spark.createDataFrame([(1, 10.0)] * 8, ["g", "v"])
    g = eq.groupBy("g").agg(udaf.gini(F.col("v")).alias("gini")).first()["gini"]
    assert abs(g) < 1e-9
    # one key holds everything → gini → (n-1)/n
    sk = spark.createDataFrame(
        [(1, 0.0)] * 7 + [(1, 100.0)], ["g", "v"]
    )
    g2 = sk.groupBy("g").agg(udaf.gini(F.col("v")).alias("gini")).first()["gini"]
    assert abs(g2 - 7 / 8) < 1e-9


def test_geometric_mean(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 8.0)], ["g", "v"])
    gm = df.groupBy("g").agg(udaf.geometric_mean(F.col("v")).alias("gm")).first()["gm"]
    assert abs(gm - 4.0) < 1e-9


def test_predicate_skew_report(spark):
    rows = [("<s>", "<hot>", "<o>")] * 50 + [("<s>", f"<p{i}>", "<o>") for i in range(10)]
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    rep = udaf.predicate_skew(tri).first()
    assert rep["n_predicates"] == 11
    assert rep["max_rows"] == 50
    assert rep["gini"] > 0.5  # heavily skewed
