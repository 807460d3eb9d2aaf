"""MinHash + LSH near-duplicate detection — the scale path for document
dedup (the exact shingle-Jaccard join in queries/textops.py is the
correctness baseline; at 100 TB the inverted-index join explodes on
common shingles, while LSH keeps candidate generation linear-ish).

Pipeline (all JVM built-ins, no Python in the loop):
  shingle (3-word windows) → per-shingle 60-bit hashes (md5-substring
  family with k salt suffixes) → signature = element-wise min per salt
  (k-column agg) → band into b bands of r rows → hash each band →
  equi-join on (band_id, band_hash) → candidate pairs (optionally
  verified with estimated Jaccard from full signatures).

The hash family is md5-derived (15 hex chars = 60 bits, always positive
in a signed long) rather than xxhash64 so the exact same values are
reproducible in ANSI SQL — the driver's DuckDB oracle verifies the full
pipeline bit-for-bit (see queries/textops.py minhash_oracle_sql).

Reference note: the reference has no dedup operator at all (its
idempotence is PK-upsert only, bear/db.py:72-83); this is part of the
training-data-pipeline extension the engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_long(col: Column, salt: str = "") -> Column:
    """60-bit hash: first 15 hex chars of md5(col || salt) as a long.

    Positive in both engines; DuckDB twin:
    ``('0x' || substr(md5(x || salt), 1, 15))::BIGINT``.
    """
    h = F.md5(F.concat(col, F.lit(salt))) if salt else F.md5(col)
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


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
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 64
) -> DataFrame:
    """One row per doc with a `sig` array of num_hashes minima.

    Each hash family member is md5_long(shingle, '#i'); the signature
    is a single groupBy with num_hashes min() aggregates — map-side
    combinable, one shuffle.
    """
    aggs = [
        F.min(md5_long(F.col("shingle"), f"#{i}")).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col,
        F.array(*[f"h{i}" for i in range(num_hashes)]).alias(
            # column metadata carries the signature length so banding
            # can derive rows-per-band from what was ACTUALLY built
            "sig", metadata={"num_hashes": num_hashes}
        ),
    )


def band_hash_expr(sig_col: str, band: int, rows_per_band: int) -> Column:
    """Hash of one band slice: md5 over the '|'-joined decimal values of
    the slice, salted with the band id (DuckDB-reproducible)."""
    sl = F.slice(F.col(sig_col), band * rows_per_band + 1, rows_per_band)
    joined = F.array_join(F.transform(sl, lambda x: x.cast("string")), "|")
    return md5_long(joined, f"#{band}")


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", bands: int = 16, num_hashes: int | None = None
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band.

    Join key is (band_id, band_hash) — an equi-join, never a cross
    join; pairs are deduplicated across bands.

    ``num_hashes`` defaults to the ACTUAL signature length (read from
    the column's array expression when statically known): a caller who
    built 128-position signatures but banded with a stale 64 default
    would silently use only half the signature — lower recall with no
    error. Pass it explicitly only to band a prefix on purpose.
    """
    if num_hashes is None:
        # minhash_signatures stamps the built length into column
        # metadata; a foreign signature frame needs one single-row probe
        meta = sig.schema["sig"].metadata or {}
        num_hashes = int(meta.get("num_hashes", 0))
        if not num_hashes:
            row = sig.select(F.size("sig").alias("n")).first()
            num_hashes = int(row["n"]) if row else 64
    if num_hashes % bands:
        raise ValueError(
            f"signature length {num_hashes} not divisible by bands={bands}"
        )
    r = num_hashes // bands
    banded = sig.select(
        id_col,
        F.posexplode(
            F.array(*[band_hash_expr("sig", b, r) for b in range(bands)])
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
    pairs = lsh_candidate_pairs(sig, id_col, bands, num_hashes)
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
