"""Sampling / splitting operators for training-data pipelines.

Beyond-reference capability (the reference has no sampling of any
kind). The operators a corpus pipeline needs before training: a
deterministic, engine-portable train/test split and per-stratum
downsampling.

Scale posture: both are single-pass, shuffle-free map operations — the
split decision is a pure function of the row's own key, so it is stable
under re-partitioning, re-runs, cluster size changes, and even engine
changes (md5 is md5 everywhere). Never split with rand(): a retried
task re-draws and rows silently change sides mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_split", "stratified_sample"]


def hash_split(
    df: DataFrame,
    key_col: str,
    train_frac: float = 0.8,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/test split on a key hash.

    A row lands in "train" iff the first 8 hex chars of
    md5(key || salt) — uniform over [0, 16^8) — fall below
    train_frac·16^8. Hex-string comparison makes the rule bit-portable
    across engines (the same SQL reproduces the exact same split in
    DuckDB/Trino/BigQuery for audits). Change ``salt`` to draw a fresh
    independent split without touching the data.
    """
    frac_hex = format(int(train_frac * 16**8), "08x")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.withColumn(
        split_col,
        F.when(F.substring(h, 1, 8) < F.lit(frac_hex), "train").otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. cap the dominant
    language at 10%): keep a row iff its key-hash falls below its
    stratum's fraction. Same md5 rule as hash_split — reproducible and
    shuffle-free, unlike sampleBy's seed-and-partition-order dependent
    Bernoulli draw. Strata missing from ``fractions`` are kept whole.
    """
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
    )
    cond = F.lit(True)
    for stratum, frac in fractions.items():
        frac_hex = format(int(frac * 16**8), "08x")
        cond = F.when(
            F.col(stratum_col) == stratum, h < F.lit(frac_hex)
        ).otherwise(cond)
    return df.filter(cond)
