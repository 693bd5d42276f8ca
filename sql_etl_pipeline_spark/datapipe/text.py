"""Text analysis operators over the ``documents`` table: token statistics,
quality scoring, language-ID heuristic, and winnowing fingerprints.

All are pure per-row column expressions (higher-order array functions —
JVM-side, no Python in the hot path) and all are oracle-gated against
DuckDB. At 100 TB each is embarrassingly parallel: no shuffle except the
final ORDER BY, which a real pipeline drops.

The reference's closest surface is its pandas transform/validation layer
(``/root/reference/src/etl_pipeline.py:247-344``,
``/root/reference/src/data_validator.py:262-311``): row-wise string checks
re-expressed as vectorized expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import char_grams, sql_char_grams, sql_tokens, tokens
from .registry import register

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "y", "los", "de"],
    "zh": ["de", "le", "he", "shi", "zai"],
}
LANGS = sorted(STOPWORDS)  # deterministic tiebreak order

_DOCS = "SELECT doc_id, text, lang FROM documents"


def _load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


# ------------------------------------------------------------- token stats


@register(
    "text_token_stats",
    f"""
    WITH docs AS ({_DOCS}),
    t AS (SELECT doc_id, text, {sql_tokens("text")} AS toks FROM docs)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           ROUND(CASE WHEN len(toks) > 0
                 THEN list_sum([CAST(length(tok) AS DOUBLE) FOR tok IN toks])
                      / len(toks) ELSE 0.0 END, 6) AS avg_token_len,
           CAST(COALESCE(list_sum([CAST(ceil(length(tok) / 4.0) AS BIGINT)
                                   FOR tok IN toks]), 0) AS BIGINT)
               AS est_bpe_tokens
    FROM t ORDER BY doc_id
    """,
    "per-doc token counts, distinct tokens, avg length, BPE-ish estimate",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    t = docs.withColumn("toks", toks)
    n = F.size("toks")
    return t.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.when(
                n > 0,
                F.aggregate(
                    F.transform("toks", lambda tk: F.length(tk).cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / n,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
        F.coalesce(
            F.aggregate(
                F.transform(
                    "toks", lambda tk: F.ceil(F.length(tk) / F.lit(4.0)).cast("long")
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
            F.lit(0).cast("long"),
        ).alias("est_bpe_tokens"),
    ).orderBy("doc_id")


# ----------------------------------------------------------- quality score

# portable char-class counts: length(s) - length(remove-all-matches)
_SQL_N = "length(text)"


def _sql_count(cls: str) -> str:
    return f"(length(text) - length(regexp_replace(text, '{cls}', '', 'g')))"


@register(
    "text_quality",
    f"""
    WITH docs AS ({_DOCS}),
    t AS (
        SELECT doc_id, text, {sql_tokens("text")} AS toks,
               CAST({_sql_count("[a-zA-Z]")} AS DOUBLE) AS n_alpha,
               CAST({_sql_count("[0-9]")} AS DOUBLE) AS n_digit,
               CAST({_sql_count("[ ]")} AS DOUBLE) AS n_space
        FROM docs
    ),
    r AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               ROUND(n_alpha / GREATEST(length(text), 1), 6) AS alpha_ratio,
               ROUND(n_digit / GREATEST(length(text), 1), 6) AS digit_ratio,
               ROUND((length(text) - n_alpha - n_digit - n_space)
                     / GREATEST(length(text), 1), 6) AS punct_ratio,
               ROUND(CASE WHEN len(toks) > 0
                     THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     ELSE 0.0 END, 6) AS distinct_ratio
        FROM t
    )
    -- score as ONE exact integer rational (see the Spark fn's docstring):
    -- num/Q == 0.4*alpha + 0.3*distinct + 0.3*min(toks/50, 1), with tier
    -- thresholds as integer compares — no chained double arithmetic, so
    -- the engines agree bit-for-bit (chained pre-rounded doubles drifted
    -- 1 ulp and crossed the 6dp boundary on 4/5000 docs at sf0.1).
    SELECT r.*,
           ROUND(CAST(num AS DOUBLE) / q, 6) AS quality_score,
           CASE WHEN 4 * num >= 3 * q THEN 'high'
                WHEN 2 * num >= q THEN 'medium'
                ELSE 'low' END AS quality_tier
    FROM r JOIN (
        SELECT doc_id,
               200 * CAST(n_alpha AS BIGINT)
                   * GREATEST(CAST(len(toks) AS BIGINT), 1)
             + 150 * CAST(len(list_distinct(toks)) AS BIGINT)
                   * GREATEST(length(text), 1)
             + 3 * LEAST(CAST(len(toks) AS BIGINT), 50)
                 * GREATEST(length(text), 1)
                 * GREATEST(CAST(len(toks) AS BIGINT), 1) AS num,
               500 * GREATEST(length(text), 1)
                   * GREATEST(CAST(len(toks) AS BIGINT), 1) AS q
        FROM t
    ) s USING (doc_id)
    ORDER BY doc_id
    """,
    "per-doc quality ratios (alpha/digit/punct/distinct) + score + tier",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir)

    def count_cls(cls: str):
        return (
            F.length("text") - F.length(F.regexp_replace("text", cls, ""))
        ).cast("double")

    t = docs.select(
        "doc_id",
        "text",
        tokens(F.col("text")).alias("toks"),
        count_cls("[a-zA-Z]").alias("n_alpha"),
        count_cls("[0-9]").alias("n_digit"),
        count_cls("[ ]").alias("n_space"),
    )
    ln = F.greatest(F.length("text"), F.lit(1))
    n_toks = F.size("toks")
    # Exact-rational score: with A=n_alpha, L=max(len,1), T=n_tokens,
    # Tn=max(T,1), D=n_distinct,
    #   0.4*A/L + 0.3*D/Tn + 0.3*min(T,50)/50  ==  num / Q
    #   num = 200*A*Tn + 150*D*L + 3*min(T,50)*L*Tn,  Q = 500*L*Tn
    # num and Q are exact BIGINTs (< 2^53 by construction), so the single
    # final division produces the SAME double in Spark and DuckDB, and the
    # tier cut-offs (>= 0.75, >= 0.5) become exact integer compares
    # 4*num >= 3*Q / 2*num >= Q. Chaining the pre-rounded double ratios
    # instead drifted 1 ulp across engines and flipped the 6th decimal on
    # 4 of 5000 docs at sf0.1.
    a_l = F.col("n_alpha").cast("long")
    d_l = F.size(F.array_distinct("toks")).cast("long")
    t_l = n_toks.cast("long")
    tn = F.greatest(t_l, F.lit(1))
    l_l = ln.cast("long")
    num = (
        F.lit(200) * a_l * tn
        + F.lit(150) * d_l * l_l
        + F.lit(3) * F.least(t_l, F.lit(50)) * l_l * tn
    )
    q = F.lit(500) * l_l * tn
    return t.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_toks.cast("long").alias("n_tokens"),
        F.round(F.col("n_alpha") / ln, 6).alias("alpha_ratio"),
        F.round(F.col("n_digit") / ln, 6).alias("digit_ratio"),
        F.round(
            (F.length("text") - F.col("n_alpha") - F.col("n_digit") - F.col("n_space"))
            / ln,
            6,
        ).alias("punct_ratio"),
        F.round(
            F.when(
                n_toks > 0,
                F.size(F.array_distinct("toks")).cast("double") / n_toks,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("distinct_ratio"),
        F.round(num.cast("double") / q, 6).alias("quality_score"),
        F.when(4 * num >= 3 * q, "high")
        .when(2 * num >= q, "medium")
        .otherwise("low")
        .alias("quality_tier"),
    ).orderBy("doc_id")


# ------------------------------------------------------------- language ID


@register(
    "text_langid",
    f"""
    WITH docs AS ({_DOCS}),
    t AS (SELECT doc_id, lang, {sql_tokens("text")} AS toks FROM docs),
    s AS (
        SELECT doc_id, lang, GREATEST(len(toks), 1) AS n,
               {", ".join(
                   f"len(list_filter(toks, tok -> list_contains("
                   f"{STOPWORDS[lg]}, tok))) AS c_{lg}"
                   for lg in LANGS
               )}
        FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           {", ".join(f"ROUND(CAST(c_{lg} AS DOUBLE) / n, 6) AS score_{lg}" for lg in LANGS)},
           CASE {" ".join(
               f"WHEN c_{lg} >= GREATEST({', '.join('c_' + o for o in LANGS)}) THEN '{lg}'"
               for lg in LANGS
           )} END AS predicted_lang
    FROM s ORDER BY doc_id
    """,
    "stopword-profile language ID vs the labeled lang column",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir)
    t = docs.select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    counts = [
        F.size(
            F.filter("toks", lambda tk: tk.isin(*STOPWORDS[lg]))
        ).alias(f"c_{lg}")
        for lg in LANGS
    ]
    s = t.select("doc_id", "lang", F.greatest(F.size("toks"), F.lit(1)).alias("n"), *counts)
    pred = None
    for lg in LANGS:  # first (lexicographic) max wins — same as SQL CASE
        cond = F.col(f"c_{lg}") >= F.greatest(*[F.col(f"c_{o}") for o in LANGS])
        pred = F.when(cond, lg) if pred is None else pred.when(cond, lg)
    return s.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            F.round(F.col(f"c_{lg}").cast("double") / F.col("n"), 6).alias(f"score_{lg}")
            for lg in LANGS
        ],
        pred.alias("predicted_lang"),
    ).orderBy("doc_id")


# ------------------------------------------------- winnowing fingerprints

_FP_K = 5  # char-gram size
_FP_W = 4  # winnowing window


@register(
    "text_fingerprint",
    f"""
    WITH docs AS ({_DOCS}),
    g AS (
        SELECT doc_id,
               [md5(x) FOR x IN {sql_char_grams("text", _FP_K)}] AS hs
        FROM docs
    ),
    w AS (
        SELECT doc_id, len(hs) AS n_grams,
               CASE WHEN len(hs) >= {_FP_W}
                    THEN list_distinct([list_aggregate(hs[i:i+{_FP_W - 1}], 'min')
                          FOR i IN generate_series(1, len(hs) - {_FP_W - 1})])
                    ELSE list_distinct(hs) END AS fps
        FROM g
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           list_aggregate(fps, 'min') AS fp_min,
           list_aggregate(fps, 'max') AS fp_max
    FROM w ORDER BY doc_id
    """,
    "winnowing fingerprints: min-hash per sliding window over char 5-grams",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load_docs(spark, sf_dir)
    g = docs.select(
        "doc_id",
        F.transform(char_grams(F.col("text"), _FP_K), F.md5).alias("hs"),
    )
    n = F.size("hs")
    wins = F.when(
        n >= _FP_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (_FP_W - 1)),
                lambda i: F.array_min(F.slice("hs", i, _FP_W)),
            )
        ),
    ).otherwise(F.array_distinct("hs"))
    w = g.select("doc_id", n.alias("n_grams"), wins.alias("fps"))
    return w.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_min("fps").alias("fp_min"),
        F.array_max("fps").alias("fp_max"),
    ).orderBy("doc_id")
