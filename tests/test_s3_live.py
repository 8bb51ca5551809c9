"""Real-S3-path tests for the fs seam (r9 verdict #5).

Two layers:

* Option plumbing — the TAS_S3_* environment must construct
  ``pyarrow.fs.S3FileSystem`` with exactly the advertised kwargs
  (graded with a recording fake, no network).
* Live protocol — the seam's list/open/write/delete run against an
  in-process moto S3 server through the REAL AWS C++ SDK (HTTP,
  signatures, multipart upload). One moto/SDK incompatibility is
  patched at the WSGI layer: moto names the CompleteMultipartUpload
  response element ``CompleteMultipartUploadResponse`` while real S3
  (and the C++ SDK parser) use ``CompleteMultipartUploadResult``.

Everything skips cleanly when pyarrow lacks S3 or moto is absent, so
the suite stays green in slim containers.
"""

import io
import threading

import pytest

from tumult_analytics_spark.sources import fs as xfs

pafs = pytest.importorskip("pyarrow.fs")
pytest.importorskip("pyarrow.fs", reason="pyarrow without fs")
if not hasattr(pafs, "S3FileSystem"):  # pragma: no cover
    pytest.skip("pyarrow built without S3", allow_module_level=True)


class TestS3OptionPlumbing:
    def test_no_env_means_default_chain(self, monkeypatch):
        for env in (*xfs.S3_ENV, *xfs.S3_FLAG_ENV):
            monkeypatch.delenv(env, raising=False)
        assert xfs.s3_options() is None

    def test_env_maps_to_constructor_kwargs(self, monkeypatch):
        monkeypatch.setenv("TAS_S3_ENDPOINT", "http://127.0.0.1:9000")
        monkeypatch.setenv("TAS_S3_REGION", "eu-west-1")
        monkeypatch.setenv("TAS_S3_ACCESS_KEY", "ak")
        monkeypatch.setenv("TAS_S3_SECRET_KEY", "sk")
        monkeypatch.setenv("TAS_S3_SCHEME", "http")
        monkeypatch.setenv("TAS_S3_ALLOW_BUCKET_CREATION", "true")
        monkeypatch.setenv("TAS_S3_ANONYMOUS", "0")
        assert xfs.s3_options() == {
            "endpoint_override": "http://127.0.0.1:9000",
            "region": "eu-west-1",
            "access_key": "ak",
            "secret_key": "sk",
            "scheme": "http",
            "allow_bucket_creation": True,
            "anonymous": False,
        }

    def test_resolve_constructs_s3fs_with_options(self, monkeypatch):
        seen = {}

        class FakeS3(pafs.LocalFileSystem):
            def __init__(self, **kwargs):
                seen.update(kwargs)
                super().__init__()

        monkeypatch.setenv("TAS_S3_ENDPOINT", "http://127.0.0.1:9000")
        monkeypatch.setenv("TAS_S3_REGION", "us-east-2")
        monkeypatch.setattr(pafs, "S3FileSystem", FakeS3)
        fs, p, prefix = xfs.resolve("s3://bkt/dir/file.warc.gz")
        assert isinstance(fs, FakeS3)
        assert p == "bkt/dir/file.warc.gz"
        assert prefix == "s3://"
        assert seen == {
            "endpoint_override": "http://127.0.0.1:9000",
            "region": "us-east-2",
        }

    def test_hadoop_aliases_reach_the_same_path(self, monkeypatch):
        seen = {}

        class FakeS3(pafs.LocalFileSystem):
            def __init__(self, **kwargs):
                seen.update(kwargs)
                super().__init__()

        monkeypatch.setenv("TAS_S3_REGION", "us-east-2")
        monkeypatch.setattr(pafs, "S3FileSystem", FakeS3)
        fs, p, prefix = xfs.resolve("s3a://bkt/k")
        assert isinstance(fs, FakeS3)
        assert (p, prefix) == ("bkt/k", "s3://")

# --- live moto server --------------------------------------------------------

moto_server = pytest.importorskip(
    "moto.server", reason="moto server mode not installed"
)


def _result_element_fix(app):
    """WSGI middleware: rename moto's CompleteMultipartUploadResponse
    element to the CompleteMultipartUploadResult the AWS C++ SDK (and
    real S3) use; the SDK otherwise reports 'error embedded in a 200
    OK response' and fails every pyarrow S3 write against moto."""

    def wrapped(environ, start_response):
        captured = {}

        def sr(status, headers, exc_info=None):
            captured["status"] = status
            captured["headers"] = headers

        body = b"".join(app(environ, sr))
        headers = captured["headers"]
        if b"CompleteMultipartUploadResponse" in body:
            body = body.replace(
                b"CompleteMultipartUploadResponse",
                b"CompleteMultipartUploadResult",
            )
            # Only a modified body may rewrite Content-Length: HEAD
            # responses carry the OBJECT length with an empty body.
            headers = [
                (k, str(len(body)) if k.lower() == "content-length" else v)
                for k, v in headers
            ]
        start_response(captured["status"], headers)
        return [body]

    return wrapped


@pytest.fixture(scope="module")
def s3_env():
    from moto.server import DomainDispatcherApplication, create_backend_app
    from werkzeug.serving import make_server

    app = _result_element_fix(
        DomainDispatcherApplication(create_backend_app)
    )
    server = make_server("127.0.0.1", 0, app, threaded=True)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.socket.getsockname()[1]
    env = {
        "TAS_S3_ENDPOINT": f"http://127.0.0.1:{port}",
        "TAS_S3_REGION": "us-east-1",
        "TAS_S3_ACCESS_KEY": "testing",
        "TAS_S3_SECRET_KEY": "testing",
        "TAS_S3_SCHEME": "http",
        "TAS_S3_ALLOW_BUCKET_CREATION": "1",
        "TAS_S3_ALLOW_BUCKET_DELETION": "1",
    }
    import os

    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    yield env
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    server.shutdown()
    thread.join(timeout=5)


class TestS3Live:
    def test_write_list_read_delete_roundtrip(self, s3_env):
        base = "s3://tas-live-test/archives"
        xfs.makedirs(base)
        payload = b"\x1f\x8b not-really-gzip \x00\xff" * 1000
        with xfs.open_output_stream(xfs.join(base, "shard-000.warc.gz")) as f:
            f.write(payload)
        with xfs.open_output_stream(xfs.join(base, "shard-001.warc.gz")) as f:
            f.write(payload[:100])
        listed = xfs.list_files(base, (".warc.gz",), prefix="shard-")
        assert [xfs.basename(p) for p in listed] == [
            "shard-000.warc.gz", "shard-001.warc.gz",
        ]
        assert all(p.startswith("s3://") for p in listed)
        assert xfs.is_file(listed[0])
        # byte-transparent read-back despite the .gz suffix
        with xfs.open_input_stream(listed[0]) as f:
            assert f.read() == payload
        xfs.delete_files([listed[1]])
        assert not xfs.is_file(xfs.join(base, "shard-001.warc.gz"))

    def test_seekable_input_file(self, s3_env):
        path = "s3://tas-live-test/seek/blob.bin"
        data = bytes(range(256)) * 64
        with xfs.open_output_stream(path) as f:
            f.write(data)
        fobj = xfs.open_input_file(path)
        fobj.seek(1000)
        assert fobj.read(8) == data[1000:1008]
        fobj.seek(0)
        assert fobj.read(4) == data[:4]

    def test_warc_roundtrip_over_s3(self, s3_env, spark):
        # The real consumer: WARC shards written to and streamed back
        # from the object store through the seam, executor-side.
        from tumult_analytics_spark.sources import warc as W

        pages = spark.createDataFrame(
            [
                (f"https://ex.com/{i}", f"<html><body>p{i}</body></html>")
                for i in range(20)
            ],
            "url string, html string",
        )
        base = "s3://tas-live-test/warcout"
        manifest = W.write_warc(pages, base, "url", "html", n_shards=3)
        assert manifest.count() == 3
        listed = xfs.list_files(base, (".warc.gz",))
        assert listed and all(p.startswith("s3://") for p in listed)
        back = W.read_warc(spark, base)
        got = sorted(r["url"] for r in back.select("url").collect())
        assert got == sorted(f"https://ex.com/{i}" for i in range(20))
