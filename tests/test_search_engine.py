"""SearchEngine facade: the reference's search_resource/search_author
surface over the embeddings table, checked against plain-DataFrame
recomputation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bear_spark.operators.similarity import cosine
from bear_spark.search import SearchEngine

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def corpus(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    # denormalized group array, like the reference's author_ids
    return e.withColumn(
        "group_ids",
        F.array((F.col("vec_id") % 7).cast("string"), (F.col("label")).cast("string")),
    )


@pytest.fixture(scope="module")
def qvec(corpus):
    return corpus.filter(F.col("vec_id") == 0).collect()[0]["embedding"]


def test_search_resource_matches_manual_pipeline(spark, corpus, qvec):
    eng = SearchEngine(corpus)
    got = eng.search_resource(
        qvec, top_k=10, filter_expr=F.col("label") != 3, min_distance=0.0
    ).toPandas()
    assert "embedding" not in got.columns, "vector column must be pruned"
    q = F.array(*[F.lit(float(x)) for x in qvec])
    want = (
        corpus.filter(F.col("label") != 3)
        .withColumn("distance", F.round(cosine(F.col("embedding"), q), 6))
        .filter(F.col("distance") >= 0.0)
        .orderBy(F.desc("distance"), "vec_id")
        .limit(10)
        .toPandas()
    )
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["distance"].tolist() == want["distance"].tolist()


def test_search_author_min_distance_filters_raw_distance(spark, corpus, qvec):
    """The reference thresholds the RAW distance before scoring
    (bear/reranker.py: `distance > min_distance`, strict >) — with a
    negated formula a score-side filter would keep nothing, so a
    non-empty result proves the filter runs on distance."""
    eng = SearchEngine(corpus)
    out = eng.search_author(
        qvec,
        group_array_col="group_ids",
        formula="-distance",
        top_k=200,
        top_n_per_group=5,
        min_distance=0.5,
        limit=10,
    ).toPandas()
    assert len(out) > 0
    assert (out["total_score"] < 0).all()  # scores are negated distances
    # every surviving hit had distance > 0.5, so each group's top-5 sum
    # is bounded below by -5 (scores in (-1, -0.5))
    assert (out["total_score"] >= -5.0).all()


def test_search_author_ranks_groups(spark, corpus, qvec):
    eng = SearchEngine(corpus)
    out = eng.search_author(
        qvec,
        group_array_col="group_ids",
        formula="pow(distance, 3)",
        top_k=200,
        top_n_per_group=5,
        limit=10,
    ).toPandas()
    assert list(out.columns) == ["_group", "total_score"]
    assert len(out) == 10
    # ranked descending, deterministic ties
    assert out["total_score"].is_monotonic_decreasing
    assert (out["total_score"] > 0).all()
