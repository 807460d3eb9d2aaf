"""SimHash document fingerprinting — 60-bit locality-sensitive hash
where near-duplicate texts differ in few bits.

Construction (all JVM built-ins): token → 60-bit md5-substring hash →
for each of 60 bit positions, sum +1/-1 weighted votes across the
document's tokens → bit i of the fingerprint = sign of vote i.
Bucketing by 15-bit chunks (pigeonhole) gives near-dup candidates.

60 bits (15 hex chars of md5) rather than 64 so the hash value is
always positive in a signed long and the exact construction is
reproducible in ANSI SQL — the driver's DuckDB oracle verifies the
fingerprints bit-for-bit (see queries/textops.py simhash_oracle_sql).

Implementation shape: one explode + one groupBy with 60 conditional
sums (map-side combinable), then bit-assembly with shiftleft.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bear_spark.operators.minhash import md5_long

BITS = 60


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per doc: `simhash` (60-bit long) fingerprint."""
    toks = docs.select(
        id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).withColumn("h", md5_long(F.col("tok")))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(BITS)
        ]
    )
    fp = None
    for i in range(BITS):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return votes.select(id_col, fp.alias("simhash"))


def hamming_distance(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    band_bits: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 60-bit fingerprint into
    60/band_bits chunks (pigeonhole: any pair within max_hamming shares
    at least one exact chunk when bands > max_hamming), equi-join on
    (band, chunk), then verify with exact hamming distance.

    ``band_bits=None`` (default) derives the widest band width that
    still satisfies the pigeonhole recall guarantee — bands =
    60/band_bits must exceed ``max_hamming``, so band_bits =
    60 // (max_hamming + 1). Passing an explicit ``band_bits`` that
    breaks the guarantee raises rather than silently missing pairs
    (wider bands = fewer candidates but a recall hole: a pair at
    distance <= max_hamming can place one differing bit in every band
    and never meet in the equi-join)."""
    if max_hamming >= BITS:
        # no banding scheme over a BITS-bit fingerprint can guarantee
        # recall at distance >= BITS: even 1-bit bands give only BITS
        # bands, and the pigeonhole argument needs bands > max_hamming.
        # Raise up front so a caller who passed no band_bits doesn't get
        # an error message about a parameter they never set.
        raise ValueError(
            f"max_hamming={max_hamming} >= fingerprint width {BITS}: no "
            f"band width can satisfy the pigeonhole recall guarantee "
            f"(need max_hamming < {BITS})"
        )
    if band_bits is None:
        band_bits = max(1, BITS // (max_hamming + 1))
    fps = simhash(docs, id_col, text_col)
    nbands = BITS // band_bits
    if nbands <= max_hamming:
        raise ValueError(
            f"band_bits={band_bits} gives {nbands} bands <= max_hamming="
            f"{max_hamming}; the pigeonhole guarantee needs more bands "
            f"(band_bits <= {BITS // (max_hamming + 1)})"
        )
    banded = fps.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    for i in range(nbands)
                ]
            )
        ).alias("band_id", "chunk"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", hamming_distance(F.col("h1"), F.col("h2")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
