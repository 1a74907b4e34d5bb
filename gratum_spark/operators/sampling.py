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


def _frac_pred(h: F.Column, frac: float) -> F.Column:
    """keep-predicate for an 8-hex-char uniform hash vs a fraction.

    Clamped: frac>=1.0 keeps everything (16^8 formats to NINE hex chars,
    and the lexicographic compare against a 9-char string would keep only
    hashes starting with '0' — ~1/16 of rows); frac<=0 keeps nothing."""
    if frac >= 1.0:
        return F.lit(True)
    if frac <= 0.0:
        return F.lit(False)
    return h < F.lit(format(int(frac * 16**8), "08x"))


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
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
    )
    return df.withColumn(
        split_col,
        F.when(_frac_pred(h, train_frac), "train").otherwise("test"),
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
        cond = F.when(
            F.col(stratum_col) == stratum, _frac_pred(h, frac)
        ).otherwise(cond)
    return df.filter(cond)
