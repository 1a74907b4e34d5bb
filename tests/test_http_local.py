"""HTTP source/operator tests against an in-process loopback server —
covers the reference's OkHttpSource behaviors (auth headers, query
params, JSON sniffing, 429 Retry-After loop, rejectNon200;
OkHttpSource.groovy:44-249) without external network.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from gratum_spark import sources
from gratum_spark.operators.http import http_fan_out


class Handler(BaseHTTPRequestHandler):
    flaky_hits = 0

    def log_message(self, *a):  # silence
        pass

    def _send(self, code: int, payload: dict, extra: dict | None = None):
        body = json.dumps(payload).encode()
        self.send_response(code)
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", "0"))
        received = self.rfile.read(n).decode()
        self._send(200, {"method": "POST", "received": received})

    def do_GET(self):
        if self.path.startswith("/echo"):
            self._send(
                200,
                {
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                },
            )
        elif self.path.startswith("/flaky"):
            Handler.flaky_hits += 1
            if Handler.flaky_hits < 3:
                self._send(429, {"err": "slow down"}, {"Retry-After": "0"})
            else:
                self._send(200, {"ok": True, "hits": Handler.flaky_hits})
        elif self.path.startswith("/missing"):
            self._send(404, {"err": "nope"})
        else:
            self._send(200, {"n": int(self.path.rsplit("/", 1)[-1])})


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_source_params_auth_json(spark, server):
    p = sources.http(
        spark, f"{server}/echo", params={"a": "1"}, auth=("user", "pw")
    )
    row = p.df.collect()[0]
    assert row["status"] == 200
    doc = json.loads(row["json"])
    assert doc["path"].endswith("/echo?a=1")
    assert doc["auth"].startswith("Basic ")


def test_http_source_retries_429_until_200(spark, server):
    Handler.flaky_hits = 0
    row = sources.http(spark, f"{server}/flaky").df.collect()[0]
    assert row["status"] == 200
    assert json.loads(row["body"])["hits"] == 3  # two 429s then success


def test_http_source_reject_non_200(spark, server):
    stat = sources.http(spark, f"{server}/missing", reject_non_200=True).go()
    assert stat.loaded == 0 and stat.rejected == 1


def test_http_fan_out_executor_side(spark, server):
    urls = spark.createDataFrame(
        [(i, f"{server}/num/{i}") for i in range(20)], "i long, url string"
    ).repartition(4)
    out = http_fan_out(urls, "url")
    got = {r["i"]: json.loads(r["json"])["n"] for r in out.collect()}
    assert got == {i: i for i in range(20)}
    assert out.filter(F.col("status") == 200).count() == 20


def test_http_source_post_body(spark, server):
    p = sources.http(spark, f"{server}/post", method="POST", body='{"x": 1}')
    row = p.df.first()
    assert row["status"] == 200
    data = json.loads(row["body"])
    assert data["method"] == "POST" and data["received"] == '{"x": 1}'
