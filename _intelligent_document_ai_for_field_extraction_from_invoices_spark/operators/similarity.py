"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline — one broadcast of the
  query vector, native `aggregate`/`zip_with` dot products (JVM-side), a
  TakeOrderedAndProject top-k (no full sort)
- IVF-bucketed ANN: the scale path — assign every vector to its nearest of
  C deterministic centroids once (one narrow pass), then probe only the
  query's bucket. At 10^12 rows the bucket assignment is the partition key,
  so a query touches 1/C of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_knn(emb: DataFrame, query_vec_id: int, k: int = 10,
               key: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k vs one stored vector. The query side is a
    1-row broadcast (no shuffle); ordering has an explicit key tie-break."""
    q = emb.filter(F.col(key) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    return (
        emb.filter(F.col(key) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            key,
            F.round(cosine_col(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(key))
        .limit(k)
    )


def label_centroid_norms(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-label mean L2 norm — sanity aggregate over the vector column."""
    return (
        emb.select("label", _norm(F.col(vec_col)).alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )


def kmeans_centroids(emb: DataFrame, num_centroids: int = 8, iters: int = 2,
                     key: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Deterministic Lloyd k-means over the embedding column — the trained
    replacement for the seeded IVF centroids (upgrade path the round-1
    docstring promised).

    Everything is native DataFrame ops: init centroids = per-(key % k)
    element-wise means (posexplode -> groupBy(cluster, pos) avg), each
    iteration broadcasts the k x dim centroid table, assigns by cosine with
    an explicit (sim desc, centroid_id asc) tie-break, and recomputes means.
    Deterministic given the data: no random init, fixed iteration count.
    Per-iteration cost is one shuffle of n x dim (pos, val) rows — the
    standard distributed-k-means profile; k and dim are small so every
    centroid table broadcast is trivial."""
    ex = emb.select(F.col(key).alias("k"), F.col(vec_col).alias("v"))
    # init: element-wise mean per (key % num_centroids) bucket
    assigned = ex.select(
        (F.col("k") % num_centroids).cast("int").alias("cid"), "v")
    for _ in range(iters + 1):
        cents = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos").agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ps"))
            .select(F.col("cid").alias("centroid_id"),
                    F.transform("ps", lambda s: s["m"]).alias("cvec"))
        )
        # reassign by cosine against the fresh centroids
        scored = ex.join(F.broadcast(cents)).select(
            "k", "v", "centroid_id",
            cosine_col(F.col("v"), F.col("cvec")).alias("sim"),
        )
        w = Window.partitionBy("k").orderBy(F.desc("sim"), F.asc("centroid_id"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("centroid_id").alias("cid"), "v")
        )
    return cents


def ivf_assign(emb: DataFrame, num_centroids: int = 8, key: str = "vec_id",
               vec_col: str = "embedding",
               centroids: DataFrame | None = None) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine. Default
    centroids are the vectors with key < num_centroids (deterministic seed
    choice, reproducible in the ANSI oracles); pass `centroids` (e.g. from
    `kmeans_centroids`) for trained buckets at scale. Centroid table is
    broadcast; argmax via window with explicit tie-break."""
    cents = centroids if centroids is not None else emb.filter(
        F.col(key) < num_centroids
    ).select(
        F.col(key).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )
    scored = emb.select(key, vec_col).join(F.broadcast(cents)).select(
        key,
        "centroid_id",
        F.round(cosine_col(F.col(vec_col), F.col("cvec")), 6).alias("sim"),
    )
    w = Window.partitionBy(key).orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(key, "centroid_id", F.col("sim").alias("centroid_sim"))
    )


def cosine_near_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                          num_centroids: int = 8, key: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed: vectors are
    assigned to their nearest centroid once, and only same-bucket pairs are
    scored — the self-join touches ~1/C^2 of the full cross product per
    bucket (the scale path; brute-force all-pairs is quadratic in rows).
    Near-dups straddling a bucket boundary are missed, as in any
    single-probe IVF — raise num_probes/overlap in a later round if recall
    matters more than cost."""
    assign = ivf_assign(emb, num_centroids, key, vec_col)
    tagged = emb.select(key, vec_col).join(assign.select(key, "centroid_id"), key)
    a = tagged.select(F.col(key).alias("vec_a"),
                      F.col(vec_col).alias("va"), "centroid_id")
    b = tagged.select(F.col(key).alias("vec_b"),
                      F.col(vec_col).alias("vb"), "centroid_id")
    return (
        a.join(b, ["centroid_id"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_ann_query(emb: DataFrame, query_vec_id: int, k: int = 5,
                  num_centroids: int = 8, key: str = "vec_id",
                  vec_col: str = "embedding",
                  centroids: DataFrame | None = None,
                  num_probes: int = 1) -> DataFrame:
    """ANN top-k probing the query's `num_probes` nearest IVF buckets
    (num_probes/C of the data — the standard recall/cost dial: 1 = fastest,
    C = exact brute force). Pass `centroids` (e.g. kmeans_centroids) for
    trained buckets. Probed-centroid choice and the final top-k both carry
    explicit tie-breaks so results are deterministic."""
    cents = centroids if centroids is not None else emb.filter(
        F.col(key) < num_centroids
    ).select(F.col(key).alias("centroid_id"), F.col(vec_col).alias("cvec"))
    assign = ivf_assign(emb, num_centroids, key, vec_col, centroids=cents)
    q = emb.filter(F.col(key) == query_vec_id).select(F.col(vec_col).alias("qvec"))
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select("centroid_id",
                F.round(cosine_col(F.col("cvec"), F.col("qvec")), 6).alias("qsim"))
        .orderBy(F.desc("qsim"), F.asc("centroid_id"))
        .limit(num_probes)
        .select("centroid_id")
    )
    bucket_members = assign.join(F.broadcast(probed), "centroid_id").select(key)
    return (
        emb.join(bucket_members, key)
        .filter(F.col(key) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            key,
            F.round(cosine_col(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(key))
        .limit(k)
    )
