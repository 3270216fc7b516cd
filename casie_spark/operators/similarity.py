"""Approximate-nearest-neighbor search over an embedding column
(array<float>) — brute-force cosine top-k baseline plus a
hyperplane-sign LSH bucketed variant as the scale path.

New capability beyond the reference (CASIE's only vector math is w2v
cosine against tiny seed lists, link_coref.py:240-309).  Shuffle shape:

- brute force: queries × corpus cross join — only for a bounded query
  set (the exactness oracle);
- LSH: one narrow projection computes an `n_planes`-bit signature per
  vector (JVM-side fold, no UDF), then the join runs per bucket —
  candidate count is |corpus| · avg_bucket_size / 2^bits instead of
  |corpus|², and buckets are uniform by construction (random
  hyperplanes), so no salting is needed.

The hyperplanes are derived from md5 so the DuckDB oracle can embed the
identical literals (``hyperplane_literals``).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_DIM = 64
DEFAULT_PLANES = 4


def hyperplane(p: int, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    md5("hp{p}_{d}") first 16 bits -> affine map.  Pure function of
    (p, d) so Spark and the SQL oracle share exact values."""
    return [
        (int(hashlib.md5(f"hp{p}_{d}".encode()).hexdigest()[:4], 16) % 2001
         - 1000) / 1000.0
        for d in range(dim)
    ]


def hyperplane_literals(n_planes: int = DEFAULT_PLANES,
                        dim: int = DEFAULT_DIM) -> list[str]:
    """SQL array literals of the hyperplanes, for oracle queries."""
    return [
        "[" + ", ".join(repr(v) for v in hyperplane(p, dim)) + "]"
        for p in range(n_planes)
    ]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(emb: DataFrame, k: int = 5, query_limit: int = 20,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k for vectors with id < query_limit — the
    recall oracle for the LSH path."""
    q = emb.filter(F.col(id_col) < query_limit).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    j = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


DEFAULT_TABLES = 4


def _bucket_expr(vec_col: str, table: int, n_planes: int, dim: int):
    """AND-amplification: one n_planes-bit bucket key per hash table."""
    bucket = None
    for p in range(n_planes):
        plane = F.lit(hyperplane(table * n_planes + p, dim))
        bit = F.when(_dot(F.col(vec_col), plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_signatures(emb: DataFrame, n_planes: int = DEFAULT_PLANES,
                   dim: int = DEFAULT_DIM, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   n_tables: int = 1) -> DataFrame:
    """(id, vec, bucket0..bucket{T-1}): per table t, bucket_t =
    Σ (dot(v, plane_{t·P+p}) > 0) << p.  AND over P planes (bucket
    equality) × OR over T tables (candidate union) is the standard
    (r, c)-amplification that makes sign-LSH usable."""
    return emb.select(
        F.col(id_col), F.col(vec_col),
        *[_bucket_expr(vec_col, t, n_planes, dim).alias(f"bucket{t}")
          for t in range(n_tables)],
    )


def exploded_signatures(emb: DataFrame, n_planes: int = DEFAULT_PLANES,
                        dim: int = DEFAULT_DIM,
                        n_tables: int = DEFAULT_TABLES,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Narrow MATERIALIZED signature index (id, t, b): every table's
    bucket key in one row-per-(vector, table) frame.

    This is the r5 plan fix for the candidate join: the per-table
    union form referenced the signature subtree 2·T times, and Spark
    has no common-subplan reuse — the T·P hyperplane folds re-ran per
    reference (8× at the defaults).  Exploding tables into rows makes
    candidate generation ONE self-join on (t, b); materializing the
    index (persist+count — it is id + two ints per row, |corpus|·T
    rows, vectors pruned) computes the folds exactly once and gives
    both join sides a cache leaf, the same no-consumer-race shape as
    dedup.ngram_jaccard's shingle packs.  At crawl scale this is the
    standard persisted ANN signature index."""
    from ..util import materialize

    sig = lsh_signatures(emb, n_planes, dim, id_col, vec_col, n_tables)
    return materialize(sig.select(
        id_col,
        F.posexplode(F.array(*[F.col(f"bucket{t}")
                               for t in range(n_tables)])).alias("t", "b"),
    ))


def lsh_candidates(sigl: DataFrame, query_limit: int,
                   id_col: str = "vec_id") -> DataFrame:
    """Distinct (query_id, neighbor_id) pairs sharing any table's
    bucket, from an :func:`exploded_signatures` frame.  One equi-join
    on the (t, b) composite key — the 100 TB-safe shape (no cross
    join anywhere; bucket keys are uniform by construction, so no
    salting either)."""
    q = sigl.filter(F.col(id_col) < query_limit).select(
        F.col(id_col).alias("query_id"), "t", "b")
    c = sigl.select(F.col(id_col).alias("neighbor_id"), "t", "b")
    return (
        q.join(c, ["t", "b"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def lsh_topk(emb: DataFrame, k: int = 3, query_limit: int = 100,
             n_planes: int = DEFAULT_PLANES, dim: int = DEFAULT_DIM,
             n_tables: int = DEFAULT_TABLES,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: multi-table hyperplane LSH candidates, exact cosine
    rerank.  Candidate count ≈ T·|corpus|/2^P per query instead of
    |corpus| — the scale path for brute_force_topk."""
    sigl = exploded_signatures(emb, n_planes, dim, n_tables=n_tables,
                               id_col=id_col, vec_col=vec_col)
    cand = lsh_candidates(sigl, query_limit, id_col)
    qv = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    j = (
        cand.join(qv, "query_id").join(cv, "neighbor_id")
        .withColumn("sim", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def ivf_topk(emb: DataFrame, k: int = 3, query_limit: int = 100,
             n_cells: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) ANN: a k-means coarse quantizer assigns every
    vector to one of ``n_cells`` cells; each query probes its
    ``n_probe`` nearest centroids and exact-reranks only those cells —
    candidate count ≈ |corpus|·n_probe/n_cells per query.

    Complements :func:`lsh_topk`: IVF adapts its partition to the data
    distribution (clustered embeddings get balanced cells where fixed
    hyperplanes would collapse), at the cost of a training pass.  The
    quantizer is `pyspark.ml` KMeans with a fixed seed — deterministic,
    and the centroid table is tiny (n_cells × dim) so probing is a
    broadcast cross join against n_cells rows, never |corpus|."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_fv"),
    )
    km = KMeans(k=n_cells, seed=42, featuresCol="_fv", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, "cell")

    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        f"cell int, centroid array<double>",
    )
    # query -> n_probe nearest centroids (euclidean, matching KMeans)
    q = assigned.filter(F.col(id_col) < query_limit).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    dist2 = F.aggregate(
        F.zip_with("qv", "centroid",
                   lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    probe_w = Window.partitionBy("query_id").orderBy("d2", "cell")
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("d2", dist2)
        .withColumn("rk", F.row_number().over(probe_w))
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    c = assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("cv"), "cell")
    j = (
        probes.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def sentence_vectors(tokens: DataFrame, word_vectors: DataFrame,
                     dim: int,
                     id_cols: tuple[str, ...] = ("doc_id", "sent_id"),
                     token_col: str = "token") -> DataFrame:
    """A8: mean word-vector per sentence (``avg_sentence_vector``,
    reference link_coref.py:285-298): sum the vectors of the
    sentence's in-vocabulary words, divide by their count; sentences
    with no known word keep the zero vector (the reference returns
    zeros when nwords == 0).

    ``word_vectors``: (word, vector array<float/double>) — any
    embedding table; the reference's w2v matrix is absent upstream, so
    tests feed a synthetic lookup through the identical contract.

    Shape: inner join (AQE picks broadcast when the vocabulary is
    small) + ONE groupBy with a zip_with fold over collect_list — all
    JVM-side, no per-row Python; the fold replaces a posexplode of
    dim x tokens rows, so the shuffle carries one array per token, not
    one row per vector component."""
    wv = word_vectors.select(
        F.lower(F.col("word")).alias("_w"),
        F.col("vector").alias("_v"),
    )
    j = tokens.select(
        *id_cols, F.lower(F.col(token_col)).alias("_w")
    ).join(wv, "_w", "inner")
    zero = F.array(*[F.lit(0.0)] * dim)
    agg = j.groupBy(*id_cols).agg(F.collect_list("_v").alias("_vs"))
    summed = F.aggregate(
        "_vs", zero,
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")),
    )
    n = F.size("_vs")
    return agg.select(
        *id_cols,
        F.transform(summed, lambda x: x / n).alias("sent_vec"),
        n.alias("n_words"),
    )


def lsh_neardup(emb: DataFrame, threshold: float = 0.4,
                n_planes: int = DEFAULT_PLANES, dim: int = DEFAULT_DIM,
                n_tables: int = DEFAULT_TABLES,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs via bucket-restricted exact cosine —
    the scale path for dedup.embedding_neardup (a true near-dup pair
    has sim→1, so its sign bits agree in some table with high
    probability)."""
    sigl = exploded_signatures(emb, n_planes, dim, n_tables=n_tables,
                               id_col=id_col, vec_col=vec_col)
    a = sigl.select(F.col(id_col).alias("doc_a"), "t", "b")
    b = sigl.select(F.col(id_col).alias("doc_b"), "t", "b")
    pairs = (
        a.join(b, ["t", "b"]).filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    va = emb.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        pairs.distinct().join(va, "doc_a").join(vb, "doc_b")
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("doc_a", "doc_b", "sim")
    )
