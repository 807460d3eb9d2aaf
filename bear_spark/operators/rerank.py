"""The reference's rerank dataflow as a reusable library operator.

Semantics preserved from the reference (bear/reranker.py:76-153 /
bear/search.py:113-122): flatten resources to one row per group key
(explode of the denormalized id array), drop rows under a score
threshold, evaluate a user-supplied arithmetic formula (there: numexpr;
here: a Spark SQL expression string compiled by Catalyst — same
vectorized-eval idea, but JVM codegen), keep each group's top-N scores,
sum them, and rank groups by total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the reference's default author-score formula, re-expressed as Spark SQL
#: (reference: bear/reranker.py:163-166; allowed fns log10/sqrt at :101;
#: `current_year` becomes year(current_date()))
DEFAULT_FORMULA = (
    "pow(distance, 3) + log10(cited_by_count + 3) "
    "+ 1 / log10(year(current_date()) - publication_year + 3)"
)


def rerank_scores(
    df: DataFrame,
    group_col: str,
    formula: str,
    order_cols: list[str],
    top_n: int = 10,
    min_score: float | None = None,
    explode_col: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """explode → filter → formula → per-group top-N sum → sort desc.

    ``order_cols`` break ties deterministically inside the top-N window.
    Returns (group_col, total_score) ordered by total desc.
    """
    out = df
    if explode_col is not None:
        out = out.withColumn(group_col, F.explode(F.col(explode_col)))
    out = out.withColumn("_score", F.expr(formula))
    if min_score is not None:
        out = out.filter(F.col("_score") > min_score)
    w = Window.partitionBy(group_col).orderBy(F.desc("_score"), *order_cols)
    ranked = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_n)
        .groupBy(group_col)
        .agg(F.round(F.sum("_score"), 4).alias("total_score"))
        .orderBy(F.desc("total_score"), group_col)
    )
    return ranked.limit(limit) if limit else ranked
