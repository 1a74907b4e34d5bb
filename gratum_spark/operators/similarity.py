"""Similarity search over embedding columns (array<float>).

Beyond-reference capability for training-data pipelines: brute-force
cosine top-k as the exact baseline, and an IVF (inverted-file) variant
as the scale path — both expression-only (no Python in the hot loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine_to_literal, dot_decimal, norm_sq_decimal

__all__ = ["cosine_topk", "cosine_topk_many", "ivf_build", "ivf_topk"]


def cosine_topk(
    df: DataFrame,
    query: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    One scan, no shuffle except the final global top-k (Spark's orderBy+
    limit is a per-partition top-k then a tiny merge — TakeOrdered — so
    this is scan-bound even at 100 TB).
    """
    scored = df.select(
        F.col(id_col),
        cosine_to_literal(F.col(vec_col), query).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def cosine_topk_many(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k per query for a (small) table of query vectors.

    Broadcast the queries, cross-join (each partition scores all queries
    locally — no shuffle of the big side), per-query top-k via window.
    For large query sets, use ivf_topk instead.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
        )
    )
    scored = df.crossJoin(q).select(
        F.col("qid"),
        F.col(id_col),
        (
            dot_decimal(F.col(vec_col), F.col("qv"))
            / (F.sqrt(norm_sq_decimal(F.col(vec_col))) * F.sqrt(norm_sq_decimal(F.col("qv"))))
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_build(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: k-means-ish centroids + per-vector list
    assignment.

    Centroid init is deterministic (hash-sampled rows); each Lloyd
    iteration is one aggregate (groupBy list_id, elementwise avg via
    posexplode-free zip aggregation). Returns (assignments, centroids):
    assignments = (id, list_id), centroids = (list_id, centroid).

    At scale: n_iters full scans at build time, then every query probes
    only the nearest lists — the classic IVF trade.
    """
    # deterministic init: first n_lists ids by xxhash64 order
    init = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_lists)
        .select(
            F.row_number().over(Window.orderBy(F.xxhash64(F.col(id_col)))).alias("list_id"),
            F.col(vec_col).alias("centroid"),
        )
    )
    centroids = init
    for _ in range(n_iters):
        assigned = _assign(df, centroids, id_col, vec_col)
        centroids = (
            assigned.join(df.select(id_col, vec_col), on=id_col)
            .groupBy("list_id")
            .agg(F.collect_list(vec_col).alias("vs"))
            .select(
                "list_id",
                # decimal-exact elementwise mean: order-independent under
                # collect_list's nondeterministic ordering, so centroids
                # (and thus assignments) are identical run to run
                F.transform(
                    F.sequence(F.lit(0), F.size(F.element_at("vs", 1)) - 1),
                    lambda i: F.aggregate(
                        "vs",
                        F.lit(0).cast("decimal(38,12)"),
                        lambda acc, v: (
                            acc + F.element_at(v, i + 1).cast("decimal(38,12)")
                        ).cast("decimal(38,12)"),
                    ).cast("double")
                    / F.size("vs"),
                ).alias("centroid"),
            )
        )
    assignments = _assign(df, centroids, id_col, vec_col)
    return assignments, centroids


def _assign(df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    c = F.broadcast(centroids)
    scored = df.crossJoin(c).select(
        F.col(id_col),
        F.col("list_id"),
        dot_decimal(F.col(vec_col), F.col("centroid")).alias("dot"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("dot").desc(), F.col("list_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "list_id")
    )


def ivf_topk(
    df: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    query: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """ANN top-k: score centroids against the query on the driver, scan
    only the n_probe nearest lists, exact cosine within them."""
    import math

    cents = centroids.collect()

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    qn = math.sqrt(dot(query, query))
    ranked = sorted(
        cents,
        key=lambda r: -dot(r["centroid"], query)
        / (math.sqrt(dot(r["centroid"], r["centroid"])) * qn + 1e-12),
    )
    probe_ids = [r["list_id"] for r in ranked[:n_probe]]
    candidates = assignments.filter(F.col("list_id").isin(probe_ids)).select(id_col)
    subset = df.join(F.broadcast(candidates), on=id_col, how="leftsemi")
    return cosine_topk(subset, query, id_col, vec_col, k)
