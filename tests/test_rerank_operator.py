"""The rerank library operator (reference: bear/reranker.py dataflow)
verified against a hand-computed pandas equivalent."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from bear_spark.operators.rerank import rerank_scores


def test_rerank_matches_pandas(spark):
    rng = np.random.default_rng(4)
    n = 2000
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "distance": rng.uniform(0, 1, n).round(3),
            "cited_by_count": rng.integers(0, 500, n),
            "author_ids": [
                [f"a{j}" for j in rng.integers(0, 40, rng.integers(1, 4))] for _ in range(n)
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    formula = "pow(distance, 3) + log10(cited_by_count + 3)"
    got = rerank_scores(
        df,
        group_col="author_id",
        formula=formula,
        order_cols=["rid"],
        top_n=10,
        min_score=0.5,
        explode_col="author_ids",
        limit=15,
    ).toPandas()

    # pandas oracle
    rows = pdf.explode("author_ids").rename(columns={"author_ids": "author_id"})
    rows["score"] = rows["distance"] ** 3 + np.log10(rows["cited_by_count"] + 3)
    rows = rows[rows["score"] > 0.5]
    top = (
        rows.sort_values(["author_id", "score", "rid"], ascending=[True, False, True])
        .groupby("author_id")
        .head(10)
        .groupby("author_id")["score"]
        .sum()
        .round(4)
        .reset_index(name="total_score")
        .sort_values(["total_score", "author_id"], ascending=[False, True])
        .head(15)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, top, check_dtype=False)


def test_rerank_without_explode(spark):
    df = spark.createDataFrame(
        [("g1", 1, 0.9), ("g1", 2, 0.8), ("g1", 3, 0.1), ("g2", 4, 0.5)],
        "grp string, rid int, distance double",
    )
    out = rerank_scores(
        df, group_col="grp", formula="distance * 2", order_cols=["rid"], top_n=2
    ).toPandas()
    assert out.iloc[0]["grp"] == "g1"
    assert abs(out.iloc[0]["total_score"] - (1.8 + 1.6)) < 1e-9
    assert abs(out.iloc[1]["total_score"] - 1.0) < 1e-9
