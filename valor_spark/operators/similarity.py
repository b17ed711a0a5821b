"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exact baseline: query set x corpus via a
  broadcast join, dot/norms with F.zip_with + F.aggregate (JVM-side), window
  top-k.  Exact but O(|Q| * N) — fine when the query set is small/broadcast.
* LSH-bucketed cosine      — the scale path: random-hyperplane signatures
  (deterministic pseudo-planes derived from dimension index) bucket the
  corpus; queries only compare within their bucket.  Approximate, near-linear.

Scale notes: the corpus side never collects; broadcasting the (small) query
set keeps the big side shuffle-free.  For 100 TB of embeddings the
LSH variant shuffles once on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _f64(col: Column) -> Column:
    """Cast array<float> -> array<double> so both engines (and the oracle)
    compute in the same precision."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with a zero-norm guard: a zero vector has no
    direction, so its similarity to anything is 0.0 — without the guard,
    Spark 4 ANSI mode aborts the whole job with DIVIDE_BY_ZERO, and with
    ANSI off the NaN result sorts ABOVE every real score, ranking the zero
    vector as everyone's top neighbor."""
    den = norm(a) * norm(b)
    return F.when(den == 0, F.lit(0.0)).otherwise(dot(a, b) / den)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is small -> broadcast; corpus streams through one stage;
    per-query top-k via window row_number (score desc, id asc tie-break).
    Self-matches (same id) are excluded.

    Norms are hoisted into per-ROW projections below the join: higher-order
    array functions are interpreted (CodegenFallback), so computing them per
    PAIR costs |Q| * N traversals where N + |Q| suffice.  The score keeps the
    exact expression shape dot/(qn*cn) — bit-identical to the inline form
    (and to the oracle's list_cosine_similarity)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _f64(F.col(vec_col)).alias("qv")
    ).select("query_id", "qv", norm(F.col("qv")).alias("qn"))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _f64(F.col(vec_col)).alias("cv")
    ).select("neighbor_id", "cv", norm(F.col("cv")).alias("cn"))
    den = F.col("qn") * F.col("cn")
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.when(den == 0, F.lit(0.0)).otherwise(
                    dot(F.col("qv"), F.col("cv")) / den
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _pseudo_plane_sign(vec: Column, plane_idx: int) -> Column:
    """Sign of <vec, r_p> where r_p is a deterministic pseudo-random
    hyperplane via the FULL shader-noise hash:
    ``r_p[d] = fract(sin(p*12.9898 + d*78.233) * 43758.5453) * 2 - 1``.

    The ``fract(sin(.) * 43758.5453)`` step is essential, not cosmetic:
    bare ``sin(p*a + d*b)`` planes are all linear combinations of the same
    two basis vectors ``(sin(d*b), cos(d*b))``, so every plane normal lives
    in ONE 2-D subspace and n planes cut it into at most 2n sectors — we
    measured exactly 20 distinct buckets at n_planes=10 (instead of up to
    1024), inflating LSH candidate volume ~50x at scale.  Multiplying by a
    large constant and taking the fractional part decorrelates dimensions
    (the classic GLSL hash) while staying exactly reproducible in any
    engine: sin/floor are IEEE-deterministic double ops."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, d: x
            * (
                (
                    lambda v: (v - F.floor(v)) * 2 - 1
                )(
                    F.sin(
                        F.lit(float(plane_idx)) * 12.9898
                        + d.cast("double") * 78.233
                    )
                    * 43758.5453
                )
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (proj >= 0).cast("int")


def lsh_bucket(vec: Column, n_planes: int = 8, table: int = 0) -> Column:
    """Random-hyperplane LSH bucket id: n_planes sign bits packed to int.
    ``table`` selects an independent plane family (multi-table LSH)."""
    out = F.lit(0)
    for p in range(n_planes):
        out = out + _pseudo_plane_sign(vec, table * 1000 + p) * F.lit(1 << p)
    return out


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is inverted-list-partitioned
    by nearest centroid; each query scores only the lists of its ``n_probe``
    nearest centroids.

    Centroids are a deterministic pseudo-random sample: the ``n_centroids``
    rows with the smallest ``md5(id)`` — a stand-in for k-means that is
    reproducible in ANY engine (the oracle replicates it verbatim); swap in
    trained centroids at production scale.

    Scale design — no driver-side materialization anywhere: the sample is
    ``orderBy(md5).limit(n)`` (``TakeOrderedAndProject``: per-partition
    partial top-k, no global sort, no ``count()``); the centroid set is
    folded to ONE row via ``collect_list`` and broadcast-crossJoined, so
    centroid assignment is a single narrow pass over the corpus (no
    ``collect()``, no per-row literal expansion, no unpartitioned Window)."""
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _f64(F.col(vec_col)).alias("cv")
    )
    centroids = (
        c.select(
            F.col("neighbor_id").alias("cid"),
            F.col("cv").alias("centroid"),
            F.md5(F.col("neighbor_id").cast("string")).alias("h"),
        )
        .orderBy("h", "cid")
        .limit(n_centroids)
    )
    cent_row = centroids.agg(
        F.collect_list(F.struct(F.col("cid"), F.col("centroid"))).alias("cents")
    )

    def nearest_lists(vec: Column, probe: int) -> Column:
        """ids of the ``probe`` nearest centroids (by cosine) as an array.
        Sort key = (-score rounded to 6, cid): descending by similarity,
        ascending id tie-break — rounded so both engines agree at float
        boundaries."""
        scored = F.transform(
            F.col("cents"),
            lambda ct: F.struct(
                (-F.round(cosine(vec, ct.getField("centroid")), 6)).alias("negs"),
                ct.getField("cid").alias("cid"),
            ),
        )
        top = F.slice(F.array_sort(scored), 1, probe)
        return F.transform(top, lambda t: t.getField("cid"))

    corpus = (
        c.crossJoin(F.broadcast(cent_row))
        .withColumn("list_id", nearest_lists(F.col("cv"), 1)[0])
        .drop("cents")
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _f64(F.col(vec_col)).alias("qv")
        )
        .crossJoin(F.broadcast(cent_row))
        .withColumn("probe", nearest_lists(F.col("qv"), n_probe))
        .drop("cents")
    )
    q = q.select("query_id", "qv", F.explode("probe").alias("list_id"))
    scored = (
        corpus.join(F.broadcast(q), on="list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int | None = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = 32,
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing an LSH bucket with the
    query (in ANY of ``n_tables`` independent plane families) are scored.
    Multiple tables are the standard recall fix for boundary flips — a
    near-identical pair split by one table's near-zero projection is joined
    by another table.  Each table's join is on its bucket key; candidates
    dedupe before scoring, so cost ~ n_tables * N/2^n_planes per query.
    ``n_planes=None`` auto-scales the signature width to the CORPUS size
    (same :func:`auto_n_planes` lever as :func:`knn_graph` — per-query
    candidate volume stays ~``target_bucket`` per table at any N)."""
    if n_planes is None:
        n_planes = auto_n_planes(
            embeddings.select(id_col).count(), target_bucket=target_bucket
        )

    def with_buckets(df: DataFrame, idc: str, vc: str) -> DataFrame:
        return df.select(
            F.col(idc),
            F.col(vc),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            lsh_bucket(F.col(vc), n_planes, t).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(idc, vc, "tb.table", "tb.bucket")

    q = with_buckets(
        queries.select(F.col(id_col).alias("query_id"), _f64(F.col(vec_col)).alias("qv")),
        "query_id",
        "qv",
    )
    c = with_buckets(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), _f64(F.col(vec_col)).alias("cv")
        ),
        "neighbor_id",
        "cv",
    )
    # score BEFORE deduping so the dedup shuffle carries scalars, not the
    # two d-dim vectors (same fat-shuffle fix as knn_graph — see ledger)
    scored = (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def auto_n_planes(
    n_vectors: int, target_bucket: int = 32, max_planes: int = 24
) -> int:
    """Plane count that holds the EXPECTED bucket size ~``target_bucket``
    as the corpus grows: ``2^planes ≈ n_vectors / target_bucket``.

    This is the documented 100x-scale lever for :func:`knn_graph` made
    executable: candidate volume per table is ``N * E[bucket size]``, so a
    FIXED plane count degrades quadratically with N while a log2-scaled one
    keeps per-bucket work constant.  ``target_bucket`` trades recall
    (bigger buckets -> more candidates -> better recall) against cost;
    ``max_planes`` caps signature width (24 planes = 16M buckets — beyond
    that bucket ids outgrow useful occupancy at any realistic N and recall
    collapses, add tables instead)."""
    import math

    if n_vectors <= target_bucket:
        return 1
    return max(1, min(max_planes, math.ceil(math.log2(n_vectors / target_bucket))))


def knn_graph(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int | None = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = 32,
) -> DataFrame:
    """Approximate k-NN GRAPH: every corpus vector gets its top-k
    bucket-sharing neighbors — the backbone of embedding-based curation
    (near-dup pruning, diversity sampling, cluster seeding).

    Same multi-table LSH shape as :func:`cosine_topk_lsh` with the
    broadcast removed: both sides are the full corpus, so the bucket join
    is a repartition self-join on ``(table, bucket)``.  Candidate volume is
    ~ ``n_tables * N * E[bucket size]`` = ``n_tables^2 * N^2 / 2^n_planes``
    worst-case uniform; raise ``n_planes`` as N grows to hold bucket sizes
    constant.  Dense embedding regions make hot buckets — AQE's skew-join
    split handles the stragglers (enabled in the engine defaults).
    Scores are rounded to 6 decimals (engine-portable) and ties rank by
    ascending neighbor id, making the graph fully deterministic.  Norms are
    hoisted per ROW below the join (array HOFs are CodegenFallback —
    interpreted — so each avoided traversal counts); the score keeps the
    exact ``dot/(na*nb)`` expression shape, so results stay bit-identical
    to the per-pair formulation and the oracle.

    ``n_planes=None`` auto-scales the signature width to the corpus size
    via :func:`auto_n_planes` (one count() over the id column — a
    metadata-only columnar scan — then ``ceil(log2(N / target_bucket))``
    planes), keeping expected bucket size ~``target_bucket`` at any N
    instead of letting candidate volume grow quadratically.
    """
    if n_planes is None:
        n_planes = auto_n_planes(
            embeddings.select(id_col).count(), target_bucket=target_bucket
        )
    base = embeddings.select(
        F.col(id_col).alias("id"), _f64(F.col(vec_col)).alias("v")
    ).withColumn("n", norm(F.col("v")))

    def with_buckets(df: DataFrame, idc: str, vc: str, nc: str) -> DataFrame:
        return df.select(
            F.col("id").alias(idc),
            F.col("v").alias(vc),
            F.col("n").alias(nc),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            lsh_bucket(F.col("v"), n_planes, t).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(idc, vc, nc, "tb.table", "tb.bucket")

    a = with_buckets(base, "src_id", "av", "an")
    b = with_buckets(base, "nbr_id", "bv", "bn")
    den = F.col("an") * F.col("bn")
    score = F.when(den == 0, F.lit(0.0)).otherwise(
        dot(F.col("av"), F.col("bv")) / den
    )
    # score BEFORE deduping: the dedup is a shuffle, and scoring first means
    # it carries (src, nbr, score) scalars instead of two d-dim vectors —
    # the fat-shuffle variant OOMs a default heap at N=20k, d=32 (measured;
    # BENCH/BASELINE.md ledger).  A pair duplicated across tables computes
    # its (deterministic) score up to n_tables times — compute is cheaper
    # than shuffling arrays.
    scored = (
        a.join(b, on=["table", "bucket"])
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select("src_id", "nbr_id", F.round(score, 6).alias("score"))
        .dropDuplicates(["src_id", "nbr_id"])
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", "nbr_id", "score", "rank")
    )
