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


def test_model_registry_multi_table_union_and_search(spark, tmp_path):
    """N declared schemas -> N lake tables + one search surface
    (reference parity: ALL_RESOURCES registration -> one collection per
    model -> per-type search fan-out, bear/model.py:231-239,
    bear/db.py:35-47, bear/search.py:113-122)."""
    from pyspark.sql import types as T

    from bear_spark.registry import ModelRegistry, TableSpec

    def vec(seedbase, n=4):
        import hashlib

        return [
            int(hashlib.md5(f"{seedbase}/{j}".encode()).hexdigest()[:4], 16) / 65535.0
            for j in range(n)
        ]

    work = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("title", T.StringType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    note = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("body", T.StringType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    reg = ModelRegistry(
        [
            TableSpec("work", work, key_cols=("doc_id",), num_buckets=2),
            TableSpec("note", note, key_cols=("doc_id",), num_buckets=2),
        ]
    )
    tables = reg.create_all(spark, str(tmp_path / "reg"))
    assert set(tables) == {"work", "note"}

    def events(schema, rows):
        df = spark.createDataFrame(rows, schema)
        return (
            df.withColumn("op", F.lit("I"))
            .withColumn("lsn", F.col("doc_id"))
            .withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        )

    w_schema = "doc_id long, title string, embedding array<float>, ts string"
    n_schema = "doc_id long, body string, embedding array<float>, ts string"
    tables["work"].merge(
        events(w_schema, [(i, f"work {i}", vec(i), None) for i in range(10)])
    )
    tables["note"].merge(
        events(n_schema, [(100 + i, f"note {i}", vec(100 + i), None) for i in range(10)])
    )

    # unioned read: superset schema + _type discriminator
    u = reg.union_read().toPandas()
    assert len(u) == 20
    assert {"title", "body", "_type"} <= set(u.columns)
    assert set(u["_type"]) == {"work", "note"}
    assert u[u["_type"] == "note"]["title"].isna().all()

    # fan-out search: global top-k across both tables, per-type k first
    q = vec(5)
    hits = reg.search(q, top_k=6, id_col="doc_id").toPandas()
    assert len(hits) == 6
    assert set(hits["_type"]) == {"work", "note"}, "both types must be searchable"
    assert hits["distance"].tolist() == sorted(hits["distance"].tolist(), reverse=True)
    assert hits.iloc[0]["doc_id"] == 5  # exact match ranks first

    # registry reload round-trips (the load_all path)
    reg2 = ModelRegistry(
        [
            TableSpec("work", work, key_cols=("doc_id",)),
            TableSpec("note", note, key_cols=("doc_id",)),
        ]
    )
    reg2.load_all(spark, str(tmp_path / "reg"))
    assert reg2.union_read().count() == 20


def test_search_author_matches_pandas_replay(spark, corpus, qvec):
    """Verdict round-4 directive 8: the COMPOSED facade (search fan-out
    → explode → formula → per-group top-N sum → rank) checked end-to-end
    against an independent pandas/numpy replay of the reference
    semantics (bear/search.py:113-122 + bear/reranker.py:76-153), not
    against another Spark pipeline."""
    import numpy as np

    eng = SearchEngine(corpus)
    got = eng.search_author(
        qvec,
        group_array_col="group_ids",
        formula="pow(distance, 3)",
        top_k=150,
        top_n_per_group=4,
        min_distance=0.05,
        limit=12,
    ).toPandas()

    def round_half_up(x, nd):
        # Spark's F.round is BigDecimal HALF_UP (away from zero), not
        # numpy's banker's rounding
        f = 10.0 ** nd
        return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f

    pdf = corpus.toPandas()
    q = np.asarray(list(qvec), dtype=np.float64)
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    d = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    pdf = pdf.assign(distance=round_half_up(d, 6))
    # fan-out: top_k by (distance desc, vec_id asc), THEN the raw-
    # distance threshold (strict >), matching search_resource+filter
    hits = (
        pdf.sort_values(["distance", "vec_id"], ascending=[False, True])
        .head(150)
    )
    hits = hits[hits["distance"] > 0.05]
    # explode group ids, formula score, per-group top-N by
    # (score desc, vec_id asc), sum, rank by (total desc, group asc)
    ex = hits.explode("group_ids").rename(columns={"group_ids": "_group"})
    ex = ex.assign(_score=ex["distance"] ** 3)
    ex = ex.sort_values(["_group", "_score", "vec_id"], ascending=[True, False, True])
    topn = ex.groupby("_group", sort=False).head(4)
    totals = (
        topn.groupby("_group")["_score"].sum().reset_index(name="total_score")
    )
    totals["total_score"] = round_half_up(totals["total_score"].to_numpy(), 4)
    totals = totals.sort_values(
        ["total_score", "_group"], ascending=[False, True]
    ).head(12)

    assert got["_group"].tolist() == totals["_group"].tolist()
    assert got["total_score"].tolist() == totals["total_score"].tolist()
