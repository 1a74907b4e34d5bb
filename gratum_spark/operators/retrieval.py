"""Distributed keyword retrieval (BM25) over a document corpus.

Beyond-reference capability: the retrieval leg of a training-data /
RAG pipeline — score every document against a (small) query set with
Okapi BM25 and keep the top-k per query. The reference has no search
of any kind; the published BM25 formula (Robertson & Spärck Jones,
probabilistic relevance framework; the ln(1 + (N-df+0.5)/(df+0.5))
idf is Lucene's non-negative variant) is public knowledge.

Scale shape — everything is expression-only JVM work:

- postings (doc, term, tf) and doc lengths come from ONE explode +
  two map-side-combinable aggregates over the corpus scan;
- corpus constants (N, avgdl) are a 1-row aggregate folded back in as
  a broadcast cross join — no driver-side collect, one Spark action
  end to end (same pattern as text.tfidf_top_terms);
- the query set is tiny by construction, so query terms broadcast and
  the only data-sized shuffles are the two corpus aggregates — per
  added query the marginal cost is a broadcast-hash probe, not a scan;
- top-k per query is a window over (query, score) — k rows per query
  survive per partial sort.

At 100 TB the postings aggregate is the cost, and it's the irreducible
one (every retrieval engine builds it); serving many query batches
amortizes it by persisting `build_postings`' two tables as parquet and
scoring against the stored index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import words

__all__ = ["build_postings", "bm25_topk", "write_postings_index", "bm25_topk_stored"]


def build_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) for a corpus: postings = (id, term, tf),
    doclens = (id, dl). Terms are lower-cased alpha runs."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    postings = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    # doclens derives from postings (dl = Σ tf per doc) instead of
    # re-tokenizing the corpus in a second explode+aggregate pass —
    # identical counts, one corpus scan fewer, and the aggregate input
    # is the (far smaller) vocabulary-sized postings table (guide §2.3:
    # aggregate the already-reduced proxy, not the raw rows again)
    doclens = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    return postings, doclens


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 documents per query. Repeated query terms count once
    (standard short-query BM25). Ties break to the lowest doc id, so
    the ranking is fully deterministic.

    Returns (query_id, rank, doc_id, score).
    """
    postings, doclens = build_postings(docs, id_col, text_col)
    # postings feeds FOUR plan branches (dft, dft_q's semi-join probe,
    # the scored join, and doclens→stats) and Catalyst does not share
    # the tokenize+aggregate subtree across them — without a cut the
    # corpus is re-tokenized once per branch. The lazy localCheckpoint
    # materializes the inverted index once at first use (the same table
    # the docstring says to persist at 100 TB); everything downstream
    # is vocabulary-sized work off it. (A/B at sf0.1: lazy 1.03 s vs
    # eager 1.18 vs no-cut 1.25 vs the old two-tokenize shape 1.25.)
    postings = postings.localCheckpoint(eager=False)
    doclens = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    stats = doclens.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    dft = postings.groupBy("term").agg(F.count("*").cast("double").alias("dft"))
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(query_text_col)), "[^a-z]+"),
                    lambda t: t != "",
                )
            )
        ).alias("term"),
    )
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5))
    )
    contrib = idf * (
        tf
        * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.col("avgdl")))
    )
    # dft is FULL-VOCABULARY sized (unbounded at corpus scale) — never
    # broadcast it whole. Semi-join it down to the query vocabulary
    # first; that result is bounded by |query terms| and safe to
    # broadcast onto the postings.
    dft_q = dft.join(
        F.broadcast(qterms.select("term").distinct()), on="term", how="left_semi"
    )
    scored = (
        postings.join(F.broadcast(qterms), on="term")
        .join(F.broadcast(dft_q), on="term")
        .join(doclens, on="id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "id")
        .agg(F.sum(contrib).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("id").alias("doc_id"),
            "score",
        )
    )


def write_postings_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n_term_buckets: int = 32,
) -> None:
    """Persist the BM25 index so query sessions read parquet instead of
    re-tokenizing the corpus — the serving form `bm25_topk`'s docstring
    promises. Four tables under ``path``:

    - ``postings/`` (id, term, tf), PARTITIONED BY term_bucket
      (xxhash64(term) % n_term_buckets) so a query batch scans only its
      own terms' directories — the retrieval analogue of
      `write_ivf_index`'s list-partitioned layout;
    - ``doclens/`` (id, dl);
    - ``dft/`` (term, dft) — vocabulary-sized; probes semi-join it down
      to the query vocabulary before any broadcast;
    - ``meta/`` one row (n_docs, avgdl, n_term_buckets) so probes
      can't silently use a mismatched bucket count.
    """
    postings, doclens = build_postings(docs, id_col, text_col)
    (
        postings.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_term_buckets))
        )
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{path}/postings")
    )
    doclens.write.mode("overwrite").parquet(f"{path}/doclens")
    postings.groupBy("term").agg(
        F.count("*").cast("double").alias("dft")
    ).write.mode("overwrite").parquet(f"{path}/dft")
    doclens.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
        F.lit(n_term_buckets).alias("n_term_buckets"),
    ).write.mode("overwrite").parquet(f"{path}/meta")


def bm25_topk_stored(
    spark,
    path: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 against a `write_postings_index` store. The query
    terms' bucket ids prune the postings scan to the matching
    ``term_bucket=`` directories (static partition pruning — the rest
    of the 100 TB index is never opened); corpus constants come from
    the 1-row meta table. Same output contract as `bm25_topk`; scores
    agree with the direct form to summation order (the stored layout
    feeds the per-doc sum in a different row order, so the last ulps of
    the double accumulation can differ — compare at a tolerance, not
    bit-exact).
    """
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_buckets = int(meta["n_term_buckets"])
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(query_text_col)), "[^a-z]+"),
                    lambda t: t != "",
                )
            )
        ).alias("term"),
    )
    buckets = [
        r["b"]
        for r in qterms.select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    ]
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("term_bucket").isin(buckets)
    )
    doclens = spark.read.parquet(f"{path}/doclens")
    dft = spark.read.parquet(f"{path}/dft")
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(meta["n_docs"])) - F.col("dft") + F.lit(0.5))
        / (F.col("dft") + F.lit(0.5))
    )
    contrib = idf * (
        tf
        * F.lit(k1 + 1.0)
        / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(meta["avgdl"])))
        )
    )
    # Same rule as `bm25_topk`: the stored dft table is vocabulary-sized,
    # so prune it to the query vocabulary before the (now bounded)
    # broadcast.
    dft_q = dft.join(
        F.broadcast(qterms.select("term").distinct()), on="term", how="left_semi"
    )
    scored = (
        postings.join(F.broadcast(qterms), on="term")
        .join(F.broadcast(dft_q), on="term")
        .join(doclens, on="id")
        .groupBy("query_id", "id")
        .agg(F.sum(contrib).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("id").alias("doc_id"), "score")
    )
