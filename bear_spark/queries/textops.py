"""Text-analysis + document-dedup operators over the `documents` table —
the training-data-pipeline operations (language ID, quality scoring,
token counting, fingerprinting, exact/near dedup) plus the reference's
string/array/map functions (strip-prefix, doc serialization, positional
reconstruction; reference: bear/utils.py:1-3, bear/model.py:164-228)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bear_spark.queries import query, t

# stopword votes for the n-gram/lexicon language-ID heuristic
_LANGSETS = {
    "en": r"\b(the|a|of|to|and|is)\b",
    "es": r"\b(el|la|de|que|y|es)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|de|et|est|les)\b",
}


@query(
    "dedup_exact_docs",
    """
    SELECT fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM (
      SELECT doc_id, md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fp
      FROM documents
    ) GROUP BY fp HAVING count(*) >= 1
    """,
)
def dedup_exact_docs(spark, sf_dir):
    """Exact dedup: the normalized-content fingerprint (md5 of
    alnum-lowered text — the document-fingerprinting op) hash-grouped;
    keep the min doc_id as canonical representative."""
    d = t(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]", ""))).alias("fp"),
    )
    return fp.groupBy("fp").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


@query(
    "lang_id_docs",
    f"""
    SELECT doc_id,
      CASE greatest(en, es, de, fr)
        WHEN en THEN 'en' WHEN es THEN 'es' WHEN de THEN 'de' ELSE 'fr'
      END AS lang_pred
    FROM (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '{_LANGSETS["en"]}')) AS en,
             len(regexp_extract_all(lower(text), '{_LANGSETS["es"]}')) AS es,
             len(regexp_extract_all(lower(text), '{_LANGSETS["de"]}')) AS de,
             len(regexp_extract_all(lower(text), '{_LANGSETS["fr"]}')) AS fr
      FROM documents
    )
    """,
)
def lang_id_docs(spark, sf_dir):
    """Lexicon-vote language ID. CASE picks the first set matching the
    max count (en > es > de > fr priority), mirroring the oracle."""
    d = t(spark, sf_dir, "documents")
    hits = d.select(
        "doc_id",
        *[
            # Spark SQL string literals process escapes (\b = backspace),
            # so the regex backslash must be doubled; DuckDB's must not.
            F.size(
                F.expr(f"regexp_extract_all(lower(text), '{pat.replace(chr(92), chr(92) * 2)}', 0)")
            ).alias(lang)
            for lang, pat in _LANGSETS.items()
        ],
    )
    g = F.greatest("en", "es", "de", "fr")
    return hits.select(
        "doc_id",
        F.when(F.col("en") == g, "en")
        .when(F.col("es") == g, "es")
        .when(F.col("de") == g, "de")
        .otherwise("fr")
        .alias("lang_pred"),
    )


@query(
    "quality_score_docs",
    """
    SELECT doc_id, n_tokens, n_bpe_words, n_chars,
           round(n_words / greatest(n_tokens, 1), 4)                       AS word_ratio,
           round(n_stop / greatest(n_words, 1), 4)                         AS stopword_ratio,
           round(n_chars / greatest(n_tokens, 1), 4)                       AS avg_token_len,
           CASE WHEN n_tokens BETWEEN 10 AND 5000
                 AND n_stop / greatest(n_words, 1) > 0.01 THEN 1 ELSE 0 END AS keep
    FROM (
      SELECT doc_id,
             len(regexp_extract_all(text, '\\S+'))            AS n_tokens,
             len(regexp_extract_all(text, '[a-zA-Z0-9]+'))    AS n_bpe_words,
             length(text)                                     AS n_chars,
             len(regexp_extract_all(text, '[a-zA-Z]+'))       AS n_words,
             len(regexp_extract_all(lower(text), '\\b(the|a|of|to|and|is)\\b')) AS n_stop
      FROM documents
    )
    """,
)
def quality_score_docs(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex + chars) and heuristic
    quality scoring in one vectorized pass: length bounds, alpha-word
    ratio, stopword ratio → keep/drop gate (Gopher-rules-style)."""
    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "text",
        F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("n_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-zA-Z0-9]+', 0)")).alias("n_bpe_words"),
        F.length("text").alias("n_chars"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-zA-Z]+', 0)")).alias("n_words"),
        F.size(
            F.expr(r"regexp_extract_all(lower(text), '\\b(the|a|of|to|and|is)\\b', 0)")
        ).alias("n_stop"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_bpe_words",
        "n_chars",
        F.round(F.col("n_words") / F.greatest(F.col("n_tokens"), F.lit(1)), 4).alias("word_ratio"),
        F.round(F.col("n_stop") / F.greatest(F.col("n_words"), F.lit(1)), 4).alias("stopword_ratio"),
        F.round(F.col("n_chars") / F.greatest(F.col("n_tokens"), F.lit(1)), 4).alias("avg_token_len"),
        F.when(
            F.col("n_tokens").between(10, 5000)
            & (F.col("n_stop") / F.greatest(F.col("n_words"), F.lit(1)) > 0.01),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )


@query(
    "strip_prefix_normalize",
    """
    SELECT doc_id, lower(regexp_replace(source, '^src', '')) AS source_norm
    FROM documents
    """,
)
def strip_prefix_normalize(spark, sf_dir):
    """Reference parity: strip_oa_prefix — URL-prefix removal +
    lowercase, implemented as prefix regexp (NOT charset lstrip; the
    reference's str.lstrip charset semantics is a known bug shape,
    reference: bear/utils.py:1-3)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.lower(F.regexp_replace("source", "^src", "")).alias("source_norm")
    )


@query(
    "doc_reconstruct_from_positions",
    """
    SELECT doc_id, string_agg(u.word, ' ' ORDER BY u.pos) AS rebuilt
    FROM (
      SELECT doc_id,
             unnest(list_transform(string_split(text, ' '),
                                   (x, i) -> {'pos': i - 1, 'word': x})) AS u
      FROM documents WHERE doc_id < 20
    ) GROUP BY doc_id
    """,
)
def doc_reconstruct_from_positions(spark, sf_dir):
    """Reference parity: _recover_abstract — invert {word: [pos...]}
    into position-sorted text (reference: bear/model.py:164-171). The
    positional explode (posexplode — the inverted-index direction,
    reference: bear/model.py:13-17) is the inner stage; the round trip
    proves both directions."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    exploded = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
    return (
        exploded.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "word"))).alias("pw"))
        .select(
            "doc_id",
            F.array_join(F.transform("pw", lambda s: s.word), " ").alias("rebuilt"),
        )
    )


def _md5_bigint_sql(expr: str) -> str:
    """DuckDB twin of operators.minhash.md5_long: 60-bit positive hash."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _minhash_oracle_sql(num_hashes: int = 64, bands: int = 16, threshold: float = 0.4) -> str:
    """Full MinHash+LSH pipeline in ANSI SQL, value-identical to
    operators/minhash.py (same md5-substring hash family, same banding,
    same est-Jaccard verify)."""
    r = num_hashes // bands
    mins = ",\n             ".join(
        "min({h}) AS h{i}".format(h=_md5_bigint_sql("shingle || '#%d'" % i), i=i)
        for i in range(num_hashes)
    )

    def band_select(b: int) -> str:
        joined = " || '|' || ".join(f"h{b * r + j}::VARCHAR" for j in range(r))
        return (
            f"SELECT doc_id, {b} AS band_id, "
            + _md5_bigint_sql(joined + " || '#%d'" % b)
            + " AS band_hash FROM sig"
        )

    banded = "\n      UNION ALL ".join(band_select(b) for b in range(bands))
    eq = " + ".join(f"(s1.h{i} = s2.h{i})::INT" for i in range(num_hashes))
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(w, (x, i) ->
                 CASE WHEN i + 2 <= len(w) THEN x || ' ' || w[i+1] || ' ' || w[i+2] END)) AS shingle
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents)
      ) WHERE shingle IS NOT NULL
    ),
    sig AS (SELECT doc_id, {mins}
            FROM sh GROUP BY doc_id),
    banded AS (
      {banded}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    )
    SELECT id1, id2, est_jaccard FROM (
      SELECT p.id1, p.id2, round(({eq}) / {num_hashes}.0, 4) AS est_jaccard
      FROM pairs p JOIN sig s1 ON p.id1 = s1.doc_id JOIN sig s2 ON p.id2 = s2.doc_id
    ) WHERE est_jaccard >= {threshold}
    """


@query("minhash_neardup_docs", _minhash_oracle_sql())
def minhash_neardup_docs(spark, sf_dir):
    """MinHash+LSH near-dup pairs (shingle → k-min signature → banded
    equi-join) — the 100 TB-scale replacement for the exact shingle
    join below; see operators/minhash.py. md5-substring hash family →
    the full pipeline is DuckDB-oracle-verified bit-for-bit; recall vs
    the exact Jaccard baseline in tests/test_dedup_similarity_ops.py."""
    from bear_spark.operators.minhash import minhash_neardup_pairs

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_neardup_pairs(d, verify_threshold=0.4)


def _simhash_oracle_sql(bits: int = 60) -> str:
    """SimHash fingerprints in ANSI SQL, value-identical to
    operators/simhash.py (same 60-bit md5-substring token hash)."""
    votes = ",\n             ".join(
        f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)" for i in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents
    ),
    h AS (SELECT doc_id, {_md5_bigint_sql('tok')} AS h FROM toks),
    votes AS (SELECT doc_id, {votes}
              FROM h GROUP BY doc_id)
    SELECT doc_id, ({fp})::BIGINT AS simhash FROM votes
    """


@query("simhash_fingerprints", _simhash_oracle_sql())
def simhash_fingerprints(spark, sf_dir):
    """60-bit SimHash per document (operators/simhash.py); md5-derived
    token hashes → DuckDB-oracle-verified bit-for-bit."""
    from bear_spark.operators.simhash import simhash

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash(d)


def _lsh_ann_oracle_sql(
    dim: int = 64, n_planes: int = 4, seed: int = 7, max_probe_hamming: int = 2, k: int = 10
) -> str:
    """Random-hyperplane LSH ANN in ANSI SQL: the hyperplanes are
    seeded literals shared with operators/similarity._planes, so both
    engines bucket identically; exact cosine re-scoring within the
    probed buckets."""
    from bear_spark.operators.similarity import _planes

    planes = _planes(dim, n_planes, seed)
    plane_lits = [f"[{', '.join(repr(float(x)) for x in p)}]::DOUBLE[]" for p in planes]
    p_cols = ", ".join(f"{lit} AS p{i}" for i, lit in enumerate(plane_lits))

    def bucket(vcol: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({vcol}, p{i}) > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(n_planes)
        )

    return f"""
    WITH p AS (SELECT {p_cols}),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    qb AS (SELECT ({bucket('qv')})::BIGINT AS qbucket FROM q, p),
    bucketed AS (
      SELECT vec_id, v, ({bucket('v')})::BIGINT AS bucket
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), p
    )
    SELECT vec_id,
           round(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM bucketed, q, qb
    WHERE bit_count(xor(bucket, qbucket)) <= {max_probe_hamming}
    ORDER BY cos_sim DESC, vec_id
    LIMIT {k}
    """


@query("lsh_ann_topk", _lsh_ann_oracle_sql())
def lsh_ann_topk_q(spark, sf_dir):
    """Approximate nearest neighbors via random-hyperplane LSH with
    multi-probe, exact-scored within candidates (operators/similarity.py).
    The seeded hyperplanes are literals in both engines, so the DuckDB
    oracle reproduces bucketing + scoring exactly; recall vs brute
    force additionally asserted in tests."""
    from pyspark.sql import functions as F

    from bear_spark.operators.similarity import lsh_ann_topk

    vecs = t(spark, sf_dir, "embeddings")
    query_vec = [float(x) for x in vecs.filter(F.col("vec_id") == 0).first()["embedding"]]
    return lsh_ann_topk(vecs, query_vec, k=10)


@query(
    "ngram_jaccard_pairs",
    """
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(w, (x, i) ->
                 CASE WHEN i + 2 <= len(w) THEN x || ' ' || w[i+1] || ' ' || w[i+2] END)) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ) WHERE shingle IS NOT NULL
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc1, doc2,
           round(inter / (s1.sz + s2.sz - inter), 4) AS jaccard
    FROM inter JOIN sizes s1 ON doc1 = s1.doc_id JOIN sizes s2 ON doc2 = s2.doc_id
    WHERE inter / (s1.sz + s2.sz - inter) >= 0.2
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    """Near-dup candidate pairs by exact 3-word-shingle Jaccard ≥ 0.2.

    Scale path: the shingle equi-join only pairs documents sharing a
    shingle (inverted-index join), never a cross join; MinHash/LSH
    (operators.minhash) replaces the exact join at 100 TB.
    """
    d = t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    sh = (
        d.filter(F.size(w) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - 3),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, 3)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    jac = F.col("inter") / (F.col("s1.sz") + F.col("s2.sz") - F.col("inter"))
    return (
        # no broadcast hint: `sizes` is one row PER DOCUMENT, so it grows
        # linearly with the corpus — a mandatory broadcast OOMs at 100×.
        # AQE picks broadcast when the (filtered) side is actually small,
        # exactly as the q5 supplier join does.
        inter.join(s1, F.col("doc1") == F.col("s1.doc_id"))
        .join(s2, F.col("doc2") == F.col("s2.doc_id"))
        .filter(jac >= 0.2)
        .select("doc1", "doc2", F.round(jac, 4).alias("jaccard"))
    )


@query(
    "validate_quarantine_docs",
    """
    SELECT reason, count(*) AS n FROM (
      SELECT CASE
        WHEN doc_id IS NULL THEN 'null_key'
        WHEN text IS NULL OR length(text) = 0 THEN 'empty_text'
        WHEN lang NOT IN ('en', 'zh', 'es') THEN 'rare_lang'
        WHEN n_chars < 200 THEN 'short_text'
        ELSE '__good__' END AS reason
      FROM documents
    ) GROUP BY reason
    """,
)
def validate_quarantine_docs(spark, sf_dir):
    """Row validation with quarantine side-output (SURVEY §2.2 P9/P2):
    declarative rules → one vectorized pass → good split + quarantined
    split with first-violated-rule reason (reference analog: per-row
    try/except skip at bear/ingest.py:38-44). Returns reject counts by
    reason plus the surviving-row count."""
    from bear_spark.operators.validate import validate

    d = t(spark, sf_dir, "documents")
    rules = {
        "null_key": F.col("doc_id").isNull(),
        "empty_text": F.col("text").isNull() | (F.length("text") == 0),
        "rare_lang": ~F.col("lang").isin("en", "zh", "es"),
        "short_text": F.col("n_chars") < 200,
    }
    good, bad = validate(d, rules)
    return bad.groupBy(F.col("_reject_reason").alias("reason")).agg(
        F.count(F.lit(1)).alias("n")
    ).unionByName(
        good.agg(F.count(F.lit(1)).alias("n")).select(F.lit("__good__").alias("reason"), "n")
    )
