"""Generate the Common-Crawl-shaped golden fixture triple
(cc_sample.warc.gz / .wet.gz / .wat.gz) checked in next to this
script. Run once; the fixture is STATIC — tests assert its sha256, so
regenerate only deliberately (and update the hashes in
test_cc_conformance.py).

The records follow the layout Common Crawl publishes (header field
order, uuid record ids, warcinfo lead record, request/response/
metadata triple, sha1-base32 digests, WET conversion + WAT metadata
sidecars) as documented in the public CC docs and the ISO 28500 WARC
spec. The container is offline, so the bytes are AUTHORED to that
public layout rather than downloaded — every digest is computed for
real, so the fixture is internally consistent and any reader can
verify it like a real crawl record.
"""

import gzip
import hashlib
import json
import os
from base64 import b32encode

HERE = os.path.dirname(os.path.abspath(__file__))

URL = "http://example.com/café/index.html"
DATE = "2017-03-22T15:25:32Z"
BODY = (
    "<!DOCTYPE html>\n<html>\n<head><meta charset=\"utf-8\"/>"
    "<title>Café — example</title></head>\n"
    "<body>\n<h1>Le café</h1>\n"
    "<p>Un café très serré, s'il vous plaît.</p>\n"
    "</body>\n</html>\n"
).encode("utf-8")
WET_TEXT = (
    "Café — example\nLe café\n"
    "Un café très serré, s'il vous plaît.\n"
).encode("utf-8")

WARCINFO_ID = "<urn:uuid:5c1e0e9b-2e7e-4cbe-a2c5-2bd7a1b3a111>"
REQUEST_ID = "<urn:uuid:0f5c36f1-31f1-4b3a-9df2-7c2ab6f0b222>"
RESPONSE_ID = "<urn:uuid:ff728363-2d5f-4f5f-b832-9552de1a6037>"
METADATA_ID = "<urn:uuid:8a9d1b77-0d3f-49c7-95a8-6e5d2c4fa333>"
WET_ID = "<urn:uuid:c7b5f7e2-64a1-41f8-a2b3-08d3e5a2c444>"
WAT_ID = "<urn:uuid:e1d2c3b4-a596-4877-b8c9-d0e1f2a3b555>"


def sha1_b32(data: bytes) -> str:
    return "sha1:" + b32encode(hashlib.sha1(data).digest()).decode()


def record(headers, block: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        b"WARC/1.0\r\n" + head.encode("utf-8") + b"\r\n"
        + block + b"\r\n\r\n"
    )


def build_warc() -> bytes:
    info_block = (
        b"robots: classic\r\n"
        b"hostname: ip-10-0-0-1.ec2.internal\r\n"
        b"software: Nutch 1.6 (CC)\r\n"
        b"isPartOf: CC-MAIN-2017-13\r\n"
        b"operator: Common Crawl Admin\r\n"
        b"description: Wide crawl of the web\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    warcinfo = record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Date", DATE),
            ("WARC-Filename", "cc_sample.warc.gz"),
            ("WARC-Record-ID", WARCINFO_ID),
            ("Content-Type", "application/warc-fields"),
            ("Content-Length", str(len(info_block))),
        ],
        info_block,
    )
    req_http = (
        b"GET /caf\xc3\xa9/index.html HTTP/1.1\r\n"
        b"Host: example.com\r\n"
        b"Accept: text/html\r\n"
        b"User-Agent: CCBot/2.0\r\n\r\n"
    )
    request = record(
        [
            ("WARC-Type", "request"),
            ("WARC-Date", DATE),
            ("WARC-Record-ID", REQUEST_ID),
            ("Content-Length", str(len(req_http))),
            ("Content-Type", "application/http; msgtype=request"),
            ("WARC-Warcinfo-ID", WARCINFO_ID),
            ("WARC-IP-Address", "203.0.113.7"),
            ("WARC-Target-URI", URL),
        ],
        req_http,
    )
    resp_http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Date: Wed, 22 Mar 2017 15:25:32 GMT\r\n"
        b"Server: Apache/2.4.18\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Content-Length: " + str(len(BODY)).encode() + b"\r\n"
        b"Connection: close\r\n\r\n" + BODY
    )
    response = record(
        [
            ("WARC-Type", "response"),
            ("WARC-Date", DATE),
            ("WARC-Record-ID", RESPONSE_ID),
            ("Content-Length", str(len(resp_http))),
            ("Content-Type", "application/http; msgtype=response"),
            ("WARC-Warcinfo-ID", WARCINFO_ID),
            ("WARC-Concurrent-To", REQUEST_ID),
            ("WARC-IP-Address", "203.0.113.7"),
            ("WARC-Target-URI", URL),
            ("WARC-Payload-Digest", sha1_b32(BODY)),
            ("WARC-Block-Digest", sha1_b32(resp_http)),
            ("WARC-Identified-Payload-Type", "text/html"),
        ],
        resp_http,
    )
    meta_block = (
        b"fetchTimeMs: 227\r\n"
        b"charset-detected: UTF-8\r\n"
        b"languages-cld2: fra\r\n"
    )
    metadata = record(
        [
            ("WARC-Type", "metadata"),
            ("WARC-Date", DATE),
            ("WARC-Record-ID", METADATA_ID),
            ("Content-Length", str(len(meta_block))),
            ("Content-Type", "application/warc-fields"),
            ("WARC-Warcinfo-ID", WARCINFO_ID),
            ("WARC-Concurrent-To", RESPONSE_ID),
            ("WARC-Target-URI", URL),
        ],
        meta_block,
    )
    return b"".join(
        gzip.compress(r, 6, mtime=0)
        for r in (warcinfo, request, response, metadata)
    )


def build_wet() -> bytes:
    conv = record(
        [
            ("WARC-Type", "conversion"),
            ("WARC-Target-URI", URL),
            ("WARC-Date", DATE),
            ("WARC-Record-ID", WET_ID),
            ("WARC-Refers-To", RESPONSE_ID),
            ("WARC-Block-Digest", sha1_b32(WET_TEXT)),
            ("Content-Type", "text/plain"),
            ("Content-Length", str(len(WET_TEXT))),
        ],
        WET_TEXT,
    )
    return gzip.compress(conv, 6, mtime=0)


def build_wat() -> bytes:
    wat_json = json.dumps(
        {
            "Envelope": {
                "Format": "WARC",
                "WARC-Header-Length": "569",
                "WARC-Header-Metadata": {
                    "WARC-Type": "response",
                    "WARC-Target-URI": URL,
                    "WARC-Date": DATE,
                    "Content-Type": "application/http; msgtype=response",
                },
                "Payload-Metadata": {
                    "Actual-Content-Type": "application/http; msgtype=response",
                    "HTTP-Response-Metadata": {
                        "Response-Message": {"Status": "200"},
                        "Headers": {"Content-Type": "text/html; charset=UTF-8"},
                        "HTML-Metadata": {
                            "Head": {"Title": "Café — example"}
                        },
                    },
                },
            }
        },
        ensure_ascii=True,
        separators=(",", ":"),
    ).encode("ascii")
    wat = record(
        [
            ("WARC-Type", "metadata"),
            ("WARC-Target-URI", URL),
            ("WARC-Date", DATE),
            ("WARC-Record-ID", WAT_ID),
            ("WARC-Refers-To", RESPONSE_ID),
            ("Content-Type", "application/json"),
            ("Content-Length", str(len(wat_json))),
        ],
        wat_json,
    )
    return gzip.compress(wat, 6, mtime=0)


if __name__ == "__main__":
    for name, data in [
        ("cc_sample.warc.gz", build_warc()),
        ("cc_sample.wet.gz", build_wet()),
        ("cc_sample.wat.gz", build_wat()),
    ]:
        out = os.path.join(HERE, name)
        with open(out, "wb") as f:
            f.write(data)
        print(name, len(data), hashlib.sha256(data).hexdigest())
