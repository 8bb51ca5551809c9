"""Golden-byte Common Crawl conformance (r8 verdict #4).

Two directions:

- READ: a static, checked-in CC-shaped fixture triple
  (tests/data/cc_sample.{warc,wet,wat}.gz — warcinfo + request +
  response + metadata, WET conversion, WAT metadata; uuid record
  ids, CC header field order, internally-consistent sha1-base32
  digests, UTF-8 body with a non-ASCII URL) must parse to exactly
  the recorded values. The fixture's sha256 is pinned, so neither
  the fixture nor the parse can drift silently.
- WRITE: the WARC/WET sink bytes for a known row are locked against
  hand-authored expected records (field order, framing, digest
  labels — the CC layout), asserted on the DECOMPRESSED record so
  zlib version differences cannot flake the lock.
"""

import gzip
import hashlib
import json
import os
from base64 import b32encode

from pyspark.sql import functions as F

from tumult_analytics_spark.sources import warc as W

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

FIXTURE_SHA256 = {
    "cc_sample.warc.gz":
        "e9d1835e0f96eb20dde6750fd272c79d29ac657f466978d0af03f9dcec307fe6",
    "cc_sample.wet.gz":
        "056cf2ef0a5bfb8c49bbb480374cc60c823553a73b98c1e5278c4bb8e36368e2",
    "cc_sample.wat.gz":
        "dfe60ce4e36e58affb1596bb5ce7cf78ee54cda3e68505bbec7a686be60e728f",
}

URL = "http://example.com/café/index.html"
DATE = "2017-03-22T15:25:32Z"
RESPONSE_ID = "<urn:uuid:ff728363-2d5f-4f5f-b832-9552de1a6037>"
BODY_TEXT = (
    "<!DOCTYPE html>\n<html>\n<head><meta charset=\"utf-8\"/>"
    "<title>Café — example</title></head>\n"
    "<body>\n<h1>Le café</h1>\n"
    "<p>Un café très serré, s'il vous plaît.</p>\n"
    "</body>\n</html>\n"
)
WET_TEXT = (
    "Café — example\nLe café\n"
    "Un café très serré, s'il vous plaît.\n"
)


def _sha1_b32(data: bytes) -> str:
    return "sha1:" + b32encode(hashlib.sha1(data).digest()).decode()


class TestFixtureIntegrity:
    def test_fixture_bytes_pinned(self):
        for name, want in FIXTURE_SHA256.items():
            with open(os.path.join(DATA, name), "rb") as f:
                got = hashlib.sha256(f.read()).hexdigest()
            assert got == want, f"{name} drifted: {got}"


class TestReadConformance:
    def test_response_record_exact(self, spark):
        rows = W.read_warc(
            spark, os.path.join(DATA, "cc_sample.warc.gz")
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["url"] == URL
        assert r["warc_date"] == DATE
        assert r["record_id"] == RESPONSE_ID
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/html; charset=UTF-8"
        assert r["html"] == BODY_TEXT
        # the reader's text round-trips to the bytes the archive's
        # own WARC-Payload-Digest covers
        assert _sha1_b32(r["html"].encode("utf-8")) == (
            "sha1:PBINP2BMM6FUZXALAOWHZBRPLURMZCBV"
        )

    def test_non_response_records_sliced(self, spark):
        p = os.path.join(DATA, "cc_sample.warc.gz")
        all_types = W.read_warc(
            spark, p,
            record_types=("warcinfo", "request", "response", "metadata"),
        ).collect()
        assert sorted(r["warc_type"] for r in all_types) == [
            "metadata", "request", "response", "warcinfo",
        ]
        by_type = {r["warc_type"]: r for r in all_types}
        # request payloads pass through raw (no response misparse)
        assert by_type["request"]["html"].startswith(
            "GET /café/index.html HTTP/1.1"
        )
        assert "isPartOf: CC-MAIN-2017-13" in by_type["warcinfo"]["html"]
        assert "languages-cld2: fra" in by_type["metadata"]["html"]

    def test_wet_conversion_exact(self, spark):
        rows = W.read_warc(
            spark, os.path.join(DATA, "cc_sample.wet.gz"),
            record_types=("conversion",),
        ).collect()
        assert len(rows) == 1
        assert rows[0]["html"] == WET_TEXT
        assert rows[0]["url"] == URL

    def test_wat_metadata_parses(self, spark):
        rows = W.read_warc(
            spark, os.path.join(DATA, "cc_sample.wat.gz"),
            record_types=("metadata",),
        ).collect()
        assert len(rows) == 1
        env = json.loads(rows[0]["html"])["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == URL
        http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
        assert http["Response-Message"]["Status"] == "200"
        assert http["HTML-Metadata"]["Head"]["Title"] == "Café — example"


class TestWriteGoldenBytes:
    """Lock the sink's record layout byte-for-byte (decompressed)."""

    def _one_shard(self, spark, tmp_path, writer, **kw):
        df = spark.createDataFrame(
            [("http://x/a", "hello café\n")], "url string, txt string"
        )
        path = str(tmp_path / "out")
        writer(df, path, "url", "txt", n_shards=1, **kw)
        files = [
            f for f in os.listdir(path) if f.startswith("shard-")
        ]
        assert len(files) == 1
        with gzip.open(os.path.join(path, files[0]), "rb") as f:
            return f.read()

    def test_warc_response_layout(self, spark, tmp_path):
        got = self._one_shard(spark, tmp_path, W.write_warc)
        body = "hello café\n".encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )
        rid = hashlib.md5(b"http://x/a").hexdigest().encode()
        want = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Date: 1970-01-01T00:00:00Z\r\n"
            b"WARC-Record-ID: <urn:md5:" + rid + b">\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"WARC-Target-URI: http://x/a\r\n"
            b"WARC-Payload-Digest: "
            + _sha1_b32(body).encode() + b"\r\n"
            b"WARC-Block-Digest: "
            + _sha1_b32(http).encode() + b"\r\n"
            b"WARC-Identified-Payload-Type: text/html\r\n\r\n"
            + http + b"\r\n\r\n"
        )
        assert got == want

    def test_wet_conversion_layout(self, spark, tmp_path):
        got = self._one_shard(spark, tmp_path, W.write_wet)
        body = "hello café\n".encode("utf-8")
        rid = hashlib.md5(b"conversion:http://x/a").hexdigest().encode()
        page = hashlib.md5(b"http://x/a").hexdigest().encode()
        want = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://x/a\r\n"
            b"WARC-Date: 1970-01-01T00:00:00Z\r\n"
            b"WARC-Record-ID: <urn:md5:" + rid + b">\r\n"
            b"WARC-Refers-To: <urn:md5:" + page + b">\r\n"
            b"WARC-Block-Digest: " + _sha1_b32(body).encode() + b"\r\n"
            b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )
        assert got == want

    def test_sink_fixture_cross_parse(self, spark, tmp_path):
        # our sink's WET output must be readable as the CC fixture
        # is: same reader, same schema, same digest verification
        df = spark.createDataFrame(
            [(URL, WET_TEXT)], "url string, txt string"
        )
        path = str(tmp_path / "wet")
        W.write_wet(df, path, "url", "txt", n_shards=1)
        rows = W.read_warc(
            spark, path, record_types=("conversion",)
        ).collect()
        assert rows[0]["html"] == WET_TEXT
        assert _sha1_b32(rows[0]["html"].encode("utf-8")) == _sha1_b32(
            WET_TEXT.encode("utf-8")
        )
