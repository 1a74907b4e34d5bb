"""Similarity search over embedding columns (array<float>).

Beyond-reference capability for training-data pipelines: brute-force
cosine top-k as the exact baseline, and an IVF (inverted-file) variant
as the scale path — both expression-only (no Python in the hot loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine_to_literal, dot_decimal, norm_sq_decimal

__all__ = [
    "cosine_topk",
    "cosine_topk_many",
    "ivf_build",
    "ivf_topk",
    "ivf_topk_many",
    "ann_recall_at_k",
    "normalize_embeddings",
    "quantize_embeddings",
    "decontaminate_embeddings",
]


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """L2-normalize an embedding column (decimal-exact norm, so the
    result is bit-identical across engines). Pre-normalizing turns
    cosine into a plain dot product downstream — one less sqrt per
    comparison in every ANN scan."""
    norm = F.sqrt(norm_sq_decimal(F.col(vec_col)))
    # zero vectors stay zero instead of tripping ANSI divide-by-zero
    safe = F.when(norm == 0.0, F.lit(1.0)).otherwise(norm)
    return df.withColumn(
        out_col or vec_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / safe),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q[i] = round(x[i]/scale) ∈ [-127, 127].

    The standard 4x memory/IO reduction for embedding tables feeding
    ANN — at 100 TB the scan is usually IO-bound, so int8 columns are a
    direct 4x on the similarity-search hot path (score int8, re-rank
    survivors at full precision). Expression-only; zero vectors get
    scale 1.0 (all-zero codes). Returns (id, scale, q).
    """
    absmax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    with_scale = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.when(absmax == 0.0, F.lit(1.0)).otherwise(absmax / F.lit(127.0)).alias("scale"),
    )
    return with_scale.select(
        id_col,
        "scale",
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") / F.col("scale")).cast("int")
        ).alias("q"),
    )


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
        # Elementwise mean per list via posexplode + groupBy — all
        # whole-stage-codegen JVM work, map-side combinable, and the
        # decimal sum is order-independent so centroids (and thus
        # assignments) are identical run to run. The earlier shape
        # (collect_list + nested transform/aggregate lambdas) ran
        # interpreted at O(dim × n_vectors) evals and was ~50× slower.
        centroids = (
            assigned.select("list_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("list_id", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
    assignments = _assign(df, centroids, id_col, vec_col).select(id_col, "list_id")
    return assignments, centroids


def _assign(df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment: (id, vec, list_id), ties to the lowest
    list_id.

    Centroids are collected to the driver (n_lists × dim — tiny, this is
    Lloyd's-with-broadcast) and closed over by an Arrow-batched numpy
    argmax: one narrow scan per pass, no join, no shuffle. Replaces a
    crossJoin × interpreted-decimal-dot + per-id window shape that
    dominated IVF build time.
    """
    rows = centroids.orderBy("list_id").collect()
    list_ids = np.array([r["list_id"] for r in rows], dtype=np.int64)
    cmat = np.array([list(r["centroid"]) for r in rows], dtype=np.float64)

    @F.pandas_udf("long")
    def best_list(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series(list_ids[np.argmax(mat @ cmat.T, axis=1)])

    return df.select(
        F.col(id_col), F.col(vec_col), best_list(F.col(vec_col)).alias("list_id")
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_iters: int = 3,
) -> None:
    """Build and PERSIST the IVF index — the production ANN shape: the
    k-means build (n_iters full scans) runs once per corpus version;
    every query session reads back (assignments, centroids) from
    parquet instead of rebuilding. Layout: ``{path}/assignments``
    (id, list_id — partitioned BY list_id so a probe scans only its
    lists' files), ``{path}/centroids`` (n_lists rows)."""
    assignments, centroids = ivf_build(df, id_col, vec_col, n_lists, n_iters)
    (
        assignments.write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{path}/assignments")
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_stored(
    df: DataFrame,
    index_path: str,
    query: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """ANN top-k against a stored index (see :func:`write_ivf_index`):
    identical answers to :func:`ivf_topk` on the same build, with the
    assignment scan pruned to the probed lists' partition directories
    (list_id is a partition column — partition pruning, no full-index
    scan)."""
    spark = df.sparkSession
    assignments = spark.read.parquet(f"{index_path}/assignments")
    centroids = spark.read.parquet(f"{index_path}/centroids")
    return ivf_topk(
        df, assignments, centroids, query, id_col, vec_col, k, n_probe
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
    only the n_probe nearest lists, exact cosine within them.

    Probe ranking uses the SAME inner-product metric that ``_assign``
    uses to place vectors into lists (FAISS-style metric consistency:
    the probed cells are the ones the query itself would land in). So
    a query vector that is in the corpus has its own list as the #1
    probed list at any n_probe >= 1 — the structural invariant the
    driver checks in ann_ivf_planted. (The earlier cosine-ranked probe
    could, on adversarial centroid norms, rank the query's own cell
    outside the probe set entirely.) One caveat keeps this short of a
    theorem: the probe's driver-side gemv and _assign's executor-side
    gemm may round a dot product differently in the last ulp, so two
    NEAR-TIED centroids could order differently between the two paths
    — which is why ann_ivf_planted probes 3 of 8 lists rather than 1
    (a last-ulp flip moves the assigned cell to probe rank 2, still
    inside the set). Exact scoring WITHIN the probed lists is still
    cosine.
    """
    cents = centroids.orderBy("list_id").collect()
    if not cents:
        # empty index (empty/fully-filtered corpus): degrade to an empty
        # top-k like the pre-r8 sort-based ranking did, don't crash the
        # matmul on a zero-row centroid matrix
        probe_ids: list[int] = []
    else:
        list_ids = np.array([r["list_id"] for r in cents], dtype=np.int64)
        cmat = np.array([list(r["centroid"]) for r in cents], dtype=np.float64)
        q = np.array(list(query), dtype=np.float64)
        order = np.argsort(-(cmat @ q), kind="stable")[:n_probe]
        probe_ids = [int(x) for x in list_ids[order]]
    # the candidate id set is (n_probe/n_lists) × CORPUS rows — unbounded,
    # so no broadcast hint on the semi-join: AQE broadcasts it only when
    # the probed lists are actually small. (Against a stored index the
    # assignment scan is already partition-pruned to the probed lists —
    # see ivf_topk_stored — so this join never sees the full corpus.)
    candidates = assignments.filter(F.col("list_id").isin(probe_ids)).select(id_col)
    subset = df.join(candidates, on=id_col, how="leftsemi")
    return cosine_topk(subset, query, id_col, vec_col, k)


def ivf_topk_many(
    df: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Batched IVF ANN: top-k for EVERY query in one distributed plan.

    Shape (the serving-offline batch-retrieval pattern — scoring a
    whole eval set or building a link graph, not one ad-hoc query):

    1. centroids (n_lists × dim — tiny) collect to the driver; an
       Arrow-batched argsort maps each query to its n_probe nearest
       lists → (qid, list_id) probe pairs, |queries|·n_probe rows;
    2. probe pairs BROADCAST-join the assignments table, so each
       corpus id is kept only for the queries probing its list — the
       scan of the big side never shuffles;
    3. candidates shuffle-join the corpus on id (the one shuffle;
       ~|queries|·n_probe/n_lists of the corpus, not all of it), then
       the query vectors broadcast in and a per-qid window takes the
       exact-cosine top-k among candidates.

    Identical answers to :func:`ivf_topk` per query. Returns
    (qid, id, cosine).
    """
    cents = centroids.orderBy("list_id").collect()
    if not cents:
        # empty index (empty/fully-filtered corpus): zero probe pairs →
        # empty top-k through the normal plan, instead of a numpy shape
        # error on the zero-row centroid matmul (mirror of ivf_topk's
        # guard; same downstream schema as the non-empty path)
        probes = queries.select(
            F.col(query_id_col).alias("qid"),
            F.col(query_vec_col).alias("qv"),
            F.lit(0).cast("long").alias("list_id"),
        ).limit(0)
    else:
        list_ids = np.array([r["list_id"] for r in cents], dtype=np.int64)
        cmat = np.array([list(r["centroid"]) for r in cents], dtype=np.float64)

        @F.pandas_udf("array<long>")
        def probe_lists(vecs: pd.Series) -> pd.Series:
            # rank lists by the ASSIGNMENT metric (raw inner product, same
            # as _assign) so a corpus vector's own list is always probed
            # first — see ivf_topk's docstring on metric consistency
            mat = np.array(vecs.tolist(), dtype=np.float64)
            order = np.argsort(-(mat @ cmat.T), axis=1, kind="stable")[:, :n_probe]
            return pd.Series([list(list_ids[row]) for row in order])

        probes = queries.select(
            F.col(query_id_col).alias("qid"),
            F.col(query_vec_col).alias("qv"),
            F.explode(probe_lists(F.col(query_vec_col))).alias("list_id"),
        )
    candidates = assignments.join(
        F.broadcast(probes.select("qid", "list_id")), on="list_id"
    ).select("qid", id_col)
    scored = (
        df.join(candidates, on=id_col)
        .join(F.broadcast(probes.select("qid", "qv").distinct()), on="qid")
        .select(
            "qid",
            F.col(id_col),
            (
                dot_decimal(F.col(vec_col), F.col("qv"))
                / (
                    F.sqrt(norm_sq_decimal(F.col(vec_col)))
                    * F.sqrt(norm_sq_decimal(F.col("qv")))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ann_recall_at_k(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    n_iters: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """Measure ANN quality: recall@k of the IVF index against exact
    brute force, per query — the metric that decides whether an index
    configuration (n_lists, n_probe) is usable before pointing it at
    100 TB. An index you haven't measured recall on is a guess.

    exact top-k comes from :func:`cosine_topk_many` (broadcast
    queries, no shuffle of the corpus); approximate top-k from
    :func:`ivf_topk_many` on a fresh deterministic build. Both sides
    are deterministically tie-broken (cosine desc, id asc), so recall
    is reproducible run to run. Returns (qid, recall) with
    recall = |approx ∩ exact| / |exact| ∈ [0, 1]; n_probe = n_lists
    must yield recall 1.0 exactly (pinned in tests).
    """
    exact = cosine_topk_many(
        df, queries, id_col, vec_col, query_id_col, query_vec_col, k
    ).select("qid", F.col(id_col).alias("__eid__"))
    assignments, centroids = ivf_build(df, id_col, vec_col, n_lists, n_iters)
    approx = ivf_topk_many(
        df, assignments, centroids, queries,
        id_col, vec_col, query_id_col, query_vec_col, k, n_probe,
    ).select("qid", F.col(id_col).alias("__aid__"))
    hits = exact.join(
        approx,
        (exact["qid"] == approx["qid"]) & (F.col("__eid__") == F.col("__aid__")),
        "left",
    ).select(exact["qid"], F.col("__aid__").isNotNull().alias("hit"))
    return hits.groupBy("qid").agg(
        (F.sum(F.col("hit").cast("int")) / F.count("*")).alias("recall")
    )


def decontaminate_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    eval_df: DataFrame,
    eval_vec_col: str | None = None,
    threshold: float = 0.3,
) -> DataFrame:
    """Semantic decontamination: drop every corpus vector whose cosine
    to ANY held-out eval vector reaches ``threshold`` — the embedding
    counterpart of `text.ngram_overlap` (paraphrased eval leakage that
    token n-grams can't see).

    Eval sets are small by nature (benchmarks, not corpora), so the
    eval matrix collects to the driver and closes over an
    Arrow-batched (batch × dim) @ (dim × n_eval) matmul — ONE corpus
    pass, no join, no shuffle; cost per row is n_eval·dim flops. For
    an eval set too big for one broadcast matrix, pre-cluster it
    (`ivf_build`) and probe per-batch against the nearest centroids'
    members instead.

    Returns (id, keep).
    """
    evc = eval_vec_col or vec_col
    rows = eval_df.select(evc).collect()
    emat = np.array([list(r[0]) for r in rows], dtype=np.float64)
    emat /= np.linalg.norm(emat, axis=1, keepdims=True)

    @F.pandas_udf("boolean")
    def contaminated(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series((mat @ emat.T).max(axis=1) >= threshold)

    return df.select(
        F.col(id_col).alias("id"),
        (~contaminated(F.col(vec_col))).alias("keep"),
    )
