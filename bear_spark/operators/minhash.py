"""MinHash + LSH near-duplicate detection — the scale path for document
dedup (the exact shingle-Jaccard join in queries/textops.py is the
correctness baseline; at 100 TB the inverted-index join explodes on
common shingles, while LSH keeps candidate generation linear-ish).

Pipeline (all JVM built-ins, no Python in the loop):
  shingle (3-word windows) → per-shingle 64-bit hashes (xxhash64 with k
  seed salts) → signature = element-wise min per seed (k-column agg) →
  band into b bands of r rows → hash each band → equi-join on
  (band_id, band_hash) → candidate pairs (optionally verified with
  exact Jaccard).

Reference note: the reference has no dedup operator at all (its
idempotence is PK-upsert only, bear/db.py:72-83); this is part of the
training-data-pipeline extension the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document."""
    w = F.split(F.col(text_col), r"\s+")
    return (
        docs.filter(F.size(w) >= k)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - k),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 64, seed: int = 1
) -> DataFrame:
    """One row per doc with a `sig` array of num_hashes minima.

    Each hash family member is xxhash64(shingle, salt_i); the signature
    is a single groupBy with num_hashes min() aggregates — map-side
    combinable, one shuffle.
    """
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(seed + i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", bands: int = 16
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band.

    Join key is (band_id, hash(band slice)) — an equi-join, never a
    cross join; pairs are deduplicated across bands.
    """
    n = None  # rows per band derived from the array length at runtime
    banded = sig.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        b * (F.size("sig") / bands).cast("int") + 1,
                        (F.size("sig") / bands).cast("int"),
                    ).cast("string"),
                    b,
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .distinct()
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """End-to-end near-dup pairs: LSH candidates, optionally verified
    with the estimated Jaccard from full signatures (fraction of equal
    signature positions)."""
    sh = shingles(docs, id_col, text_col)
    sig = minhash_signatures(sh, id_col, num_hashes)
    pairs = lsh_candidate_pairs(sig, id_col, bands)
    if verify_threshold is None:
        return pairs
    s1 = sig.select(F.col(id_col).alias("id1"), F.col("sig").alias("sig1"))
    s2 = sig.select(F.col(id_col).alias("id2"), F.col("sig").alias("sig2"))
    est = F.aggregate(
        F.zip_with("sig1", "sig2", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.size("sig1")
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= verify_threshold)
        .select("id1", "id2", "est_jaccard")
    )
