"""Deduplication operators over the ``documents`` table.

The driver corpus has no natural duplicates, so every query first derives
``corpus`` = documents ∪ deterministic copies — exact copies for
``doc_id % 7 = 0`` (ids +100000) and near-copies with the first 14 chars
dropped for ``doc_id % 7 IN (1, 2)`` (ids +200000) — identically in Spark
and in the DuckDB oracle. Detection operators then have real positives to
find, and the oracle gate checks the *full pipeline* (derivation included).

Scale notes (the 100 TB story):

* exact dedup is a hash-groupBy on ``md5(normalized text)`` — one shuffle
  of (hash, id), map-side combined;
* n-gram Jaccard joins an inverted shingle index with itself — quadratic in
  docs-per-shingle. Two defenses: a document-frequency cap (shingles in
  more than ``_DF_CAP`` docs leave the Jaccard universe, bounding any one
  shingle's join cost at DF_CAP² at a documented recall trade), and using
  the banded MinHash path as the candidate generator at scale with this as
  the *verifier*;
* MinHash+LSH is the candidate generator at scale: 16 portable min-hashes
  derived as 4 x 32-bit slices of 4 seeded md5 digests (the standard
  few-digests/many-slices economy: each 8-hex-char slice is an independent
  uniform ordering key, so one digest yields 4 min-hash functions at 1/4
  the hash cost), 4 bands of 4 → band-bucket self-join touches only
  probable pairs, then exact Jaccard verifies. Cost is linear in docs +
  output pairs;
* SimHash gives 32-bit fingerprints; Hamming-≤3 pairs via 4-band pigeonhole
  (a pair within distance 3 must agree on ≥1 of 4 bytes).

All hashes are md5-hex (portable across engines — see ``common.py``);
min-over-hex-strings is the minhash primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import (
    SQL_NORM,
    norm_text,
    seeded_md5,
    sql_seeded_md5,
    sql_tokens,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from .registry import register

# ------------------------------------------------------------------ corpus

CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 200000 AS doc_id, substr(text, 15) AS text
    FROM documents WHERE doc_id % 7 IN (1, 2)
"""


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = docs.filter((F.col("doc_id") % 7).isin(1, 2)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.expr("substring(text, 15)").alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


# ------------------------------------------------------------- exact dedup


@register(
    "dedup_exact",
    f"""
    WITH corpus AS ({CORPUS_SQL}),
    h AS (
        SELECT doc_id, md5({SQL_NORM.format(c="text")}) AS content_hash FROM corpus
    ),
    g AS (
        SELECT content_hash, CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM h GROUP BY content_hash HAVING COUNT(*) > 1
    )
    SELECT h.doc_id, g.canonical_id, g.group_size, h.content_hash
    FROM h JOIN g ON h.content_hash = g.content_hash
    ORDER BY h.doc_id
    """,
    "exact dedup: hash-groupBy on normalized text, canonical = min doc_id",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = corpus(spark, sf_dir)
    h = c.select("doc_id", F.md5(norm_text(F.col("text"))).alias("content_hash"))
    g = (
        h.groupBy("content_hash")
        .agg(
            F.min("doc_id").cast("long").alias("canonical_id"),
            F.count("*").alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )
    return (
        h.join(g, "content_hash")
        .select("doc_id", "canonical_id", "group_size", "content_hash")
        .orderBy("doc_id")
    )


# ----------------------------------------------------- n-gram Jaccard pairs

_SH_K = 3  # word 3-shingles
_JACCARD_MIN = 0.5

# doc -> distinct shingles, as SQL (reused by minhash verify)
_SHINGLE_SQL = f"""
        SELECT doc_id,
               unnest(list_distinct({sql_word_shingles("toks", _SH_K)})) AS shingle
        FROM (SELECT doc_id, {sql_tokens("text")} AS toks FROM corpus)
"""


def _shingle_index(c: DataFrame) -> DataFrame:
    """Inverted index (doc_id, shingle), shingles distinct per doc.

    Materialized once via localCheckpoint: every dedup query reuses this
    frame 3-5x (sizes, signatures, both sides of the verify join) and
    recomputing the tokenize+shingle pipeline per use dominated the wall
    time (46s -> ~12s for MinHash+LSH at sf0.1). At cluster scale the same
    role is played by writing the index to a temp table.

    EAGER on purpose: a lazy localCheckpoint materializes inside whichever
    downstream action fires first, and under AQE that action's sibling
    shuffle-stage tasks can complete AFTER the checkpoint truncates the
    pre-checkpoint lineage and drops its plan — the weakly-referenced SQL
    metric accumulators get GC'd and every late task-completion logs a
    benign-but-noisy "attempted to access non-existent accumulator"
    DAGScheduler ERROR (observed as a deterministic ~40-line burst at the
    start of dedup_minhash_lsh in bench runs). Eager checkpointing runs the
    materialization while this call still holds the plan, closing the race."""
    return c.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(tokens(F.col("text")), _SH_K))).alias(
            "shingle"
        ),
    ).localCheckpoint(eager=True)


#: document-frequency cap: shingles present in more than this many documents
#: are dropped from the Jaccard universe. An inverted-index self-join is
#: quadratic in docs-per-shingle, so ONE stopword-like shingle shared by m
#: docs costs m^2 join rows; capping bounds the per-shingle cost at DF_CAP^2
#: and makes the exact path linear-ish in corpus size. Recall tradeoff:
#: pairs similar ONLY through ultra-common (low-information) shingles are
#: missed — the standard trade in near-dup mining; both engines apply the
#: identical cap so the oracle comparison stays exact.
_DF_CAP = 100


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH corpus AS ({CORPUS_SQL}),
    sh0 AS ({_SHINGLE_SQL}),
    hot AS (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > {_DF_CAP}
    ),
    sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b, CAST(i.n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(i.n_shared AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - i.n_shared), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_shared)
          >= {_JACCARD_MIN}
    ORDER BY doc_a, doc_b
    """,
    f"near-dup pairs by word-3-shingle Jaccard >= 0.5 (exact inverted index, "
    f"shingle document-frequency capped at {_DF_CAP})",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh0 = _shingle_index(corpus(spark, sf_dir))
    # df-cap: the hot list is tiny by definition (few shingles can exceed
    # DF_CAP docs) -> broadcast anti-join prunes the index in one map stage
    hot = (
        sh0.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > _DF_CAP)
        .select("shingle")
    )
    sh = sh0.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= _JACCARD_MIN)
        .select("doc_a", "doc_b", "n_shared", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------------------- MinHash+LSH

_N_HASH = 16
_N_BANDS = 4
_ROWS_PER_BAND = _N_HASH // _N_BANDS
_SLICES_PER_DIGEST = 4  # 32 hex chars -> 4 slices of 8 (32 bits each)


def _sig_sql() -> str:
    # hash i = 8-hex-char slice (i % 4) of seeded digest (i // 4): 16
    # orderings from only 4 md5 computations per shingle row. DuckDB and
    # Spark slice the same hex text, so min-keys agree byte-for-byte.
    mins = ", ".join(
        f"MIN(substr({sql_seeded_md5(i // _SLICES_PER_DIGEST, 'shingle')}, "
        f"{(i % _SLICES_PER_DIGEST) * 8 + 1}, 8)) AS h{i}"
        for i in range(_N_HASH)
    )
    return f"SELECT doc_id, {mins} FROM sh GROUP BY doc_id"


def _bands_sql() -> str:
    selects = []
    for b in range(_N_BANDS):
        cols = " || ".join(f"h{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND))
        selects.append(
            f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_key FROM sig"
        )
    return " UNION ALL ".join(selects)


@register(
    "dedup_minhash_lsh",
    f"""
    WITH corpus AS ({CORPUS_SQL}),
    sh AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    sig AS ({_sig_sql()}),
    bands AS ({_bands_sql()}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, CAST(i.n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(i.n_shared AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - i.n_shared), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_shared)
          >= {_JACCARD_MIN}
    ORDER BY doc_a, doc_b
    """,
    "near-dup pairs via MinHash (16 hashes from 4 sliced digests) + LSH "
    "(4 bands), Jaccard-verified",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_index(corpus(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # 4 seeded digests x 4 slices = 16 min-hash orderings; the 4 repeated
    # md5 sub-expressions are shared across the 16 MINs by Spark's aggregate
    # subexpression elimination, so each shingle row hashes 4x, not 16x.
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    seeded_md5(i // _SLICES_PER_DIGEST, F.col("shingle")),
                    (i % _SLICES_PER_DIGEST) * 8 + 1,
                    8,
                )
            ).alias(f"h{i}")
            for i in range(_N_HASH)
        ]
    )
    band_frames = []
    for b in range(_N_BANDS):
        cols = [f"h{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)]
        band_frames.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band_idx"),
                F.md5(F.concat(*[F.col(c) for c in cols])).alias("band_key"),
            )
        )
    bands = band_frames[0]
    for bf in band_frames[1:]:
        bands = bands.unionByName(bf)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    inter = (
        cand.join(sh.alias("sa2"), F.col("doc_a") == F.col("sa2.doc_id"))
        .join(
            sh.alias("sb2"),
            (F.col("doc_b") == F.col("sb2.doc_id"))
            & (F.col("sa2.shingle") == F.col("sb2.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= _JACCARD_MIN)
        .select("doc_a", "doc_b", "n_shared", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ----------------------------------------------------------------- SimHash

_SIM_BITS = 32
_HAM_MAX = 3
_SIM_BANDS = 4
_BITS_PER_BAND = _SIM_BITS // _SIM_BANDS

# Portable bit extraction: bit i of a shingle = (hex nibble i of md5) >= 8,
# i.e. the top bit of each of the 32 md5 hex nibbles.


def _simhash_sql() -> str:
    """Per-doc 32-char '0'/'1' simhash string from shingle md5 nibbles."""
    # hex nibble's top bit set <=> its char >= '8' ('a'..'f' > '9' in ASCII)
    bits = ", ".join(
        f"CASE WHEN SUM(CASE WHEN substr(h, {i + 1}, 1) >= '8' "
        f"THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END AS b{i}"
        for i in range(_SIM_BITS)
    )
    concat = " || ".join(f"b{i}" for i in range(_SIM_BITS))
    return f"""
        SELECT doc_id, {concat} AS simhash FROM (
            SELECT doc_id, {bits}
            FROM (SELECT doc_id, md5(shingle) AS h FROM sh)
            GROUP BY doc_id
        )
    """


def _hamming_sql(a: str, b: str) -> str:
    terms = " + ".join(
        f"CASE WHEN substr({a}, {i + 1}, 1) <> substr({b}, {i + 1}, 1) "
        f"THEN 1 ELSE 0 END"
        for i in range(_SIM_BITS)
    )
    return f"({terms})"


@register(
    "dedup_simhash",
    f"""
    WITH corpus AS ({CORPUS_SQL}),
    sh AS ({_SHINGLE_SQL}),
    sim AS ({_simhash_sql()}),
    bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, simhash, {b} AS band_idx, "
            f"substr(simhash, {b * _BITS_PER_BAND + 1}, {_BITS_PER_BAND}) AS band_key "
            f"FROM sim"
            for b in range(_SIM_BANDS)
        )}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS simhash_a, b.simhash AS simhash_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, simhash_a, simhash_b,
           CAST({_hamming_sql("simhash_a", "simhash_b")} AS BIGINT) AS hamming
    FROM cand
    WHERE {_hamming_sql("simhash_a", "simhash_b")} <= {_HAM_MAX}
    ORDER BY doc_a, doc_b
    """,
    "near-dup pairs via 32-bit SimHash, Hamming<=3, 4-band pigeonhole LSH",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_index(corpus(spark, sf_dir))
    hashed = sh.select("doc_id", F.md5(F.col("shingle")).alias("h"))
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.when(
                F.sum(
                    F.when(F.substring(F.col("h"), i + 1, 1) >= "8", 1).otherwise(-1)
                )
                > 0,
                "1",
            )
            .otherwise("0")
            .alias(f"b{i}")
            for i in range(_SIM_BITS)
        ]
    )
    sim = bit_sums.select(
        "doc_id", F.concat(*[F.col(f"b{i}") for i in range(_SIM_BITS)]).alias("simhash")
    )
    band_frames = [
        sim.select(
            "doc_id",
            "simhash",
            F.lit(b).alias("band_idx"),
            F.substring("simhash", b * _BITS_PER_BAND + 1, _BITS_PER_BAND).alias(
                "band_key"
            ),
        )
        for b in range(_SIM_BANDS)
    ]
    bands = band_frames[0]
    for bf in band_frames[1:]:
        bands = bands.unionByName(bf)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("simhash_a"),
            F.col("b.simhash").alias("simhash_b"),
        )
        .distinct()
    )
    ham = sum(
        F.when(
            F.substring("simhash_a", i + 1, 1) != F.substring("simhash_b", i + 1, 1), 1
        ).otherwise(0)
        for i in range(_SIM_BITS)
    )
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= _HAM_MAX)
        .select("doc_a", "doc_b", "simhash_a", "simhash_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )
