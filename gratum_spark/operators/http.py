"""Partition-parallel HTTP fan-out over a URL column.

Reference: OkHttpSource fetches ONE url per source (OkHttpSource.
groovy:44-249). The distributed generalization — the shape a 100 TB
pipeline actually needs — takes a DataFrame with a url column and
fetches every row's URL from the executors: mapInPandas, one task per
partition, each task a sequential fetch loop with the reference's retry
policy (MAX_RETRIES=5, honor Retry-After on 429 —
OkHttpSource.groovy:46,207-247).

Scale notes: repartition the URL table to (desired concurrency) before
calling; per-partition fetches are sequential so total concurrency =
number of concurrent tasks. Politeness/rate-limiting beyond Retry-After
is the caller's concern (e.g. salt by host and add a per-partition
sleep).
"""

from __future__ import annotations

import json as _json
import time
import urllib.error
import urllib.request
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["http_fan_out"]


def _fetch_one(
    url: str,
    headers: dict[str, str],
    timeout: float,
    max_retries: int,
) -> tuple[int, str]:
    status, body = 0, ""
    for attempt in range(max_retries + 1):
        req = urllib.request.Request(url, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                # file:// has no HTTP status; treat success as 200
                status = getattr(resp, "status", 200) or 200
                body = resp.read().decode("utf-8", "replace")
            break
        except urllib.error.HTTPError as e:
            status, body = e.code, e.read().decode("utf-8", "replace")
            if e.code == 429 and attempt < max_retries:
                time.sleep(float(e.headers.get("Retry-After", "1")))
                continue
            break
        except (urllib.error.URLError, OSError) as e:
            status, body = -1, str(e)
            break
    return status, body


def http_fan_out(
    df: DataFrame,
    url_col: str = "url",
    headers: dict[str, str] | None = None,
    bearer: str | None = None,
    timeout: float = 30.0,
    max_retries: int = 5,
) -> DataFrame:
    """Fetch every row's URL executor-side.

    Output = input columns + (status int, body string, json string|null).
    status -1 = transport error (body carries the message); json is the
    re-serialized parse when the body is valid JSON, else null —
    mirroring the reference's content sniffing (OkHttpSource.groovy:
    222-235)."""
    req_headers = dict(headers or {})
    if bearer:
        req_headers["Authorization"] = f"Bearer {bearer}"

    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{in_fields}, `status` int, `body` string, `json` string"

    def _run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            pdf = pdf.copy()
            results = [
                _fetch_one(u, req_headers, timeout, max_retries)
                for u in pdf[url_col]
            ]
            pdf["status"] = [s for s, _ in results]
            pdf["body"] = [b for _, b in results]

            def sniff(item):
                s, b = item
                try:
                    return _json.dumps(_json.loads(b))
                except (ValueError, TypeError):
                    return None

            pdf["json"] = [sniff(r) for r in results]
            yield pdf

    return df.mapInPandas(_run, schema)
