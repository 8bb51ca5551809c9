"""Filesystem seam for the archive stack (WARC/WET/WAT/webdataset).

The archive connectors follow a paths-to-tasks contract: the driver
lists O(n_files) shard NAMES, each task opens ITS OWN file and
streams records with O(record) memory. That contract is
filesystem-agnostic — the only POSIX-ism in the original sinks and
sources was the raw ``open()``/``glob`` calls. This module replaces
them with `pyarrow.fs <https://arrow.apache.org/docs/python/
filesystems.html>`_, Arrow's C++ filesystem layer, because it is the
one public FS abstraction that is (a) already a hard dependency of
the engine, (b) importable inside executor Python workers WITHOUT a
JVM gateway (``spark._jvm`` Hadoop FileSystem handles exist only on
the driver, so they cannot open files from a ``mapInPandas`` task),
and (c) natively speaks the stores 100 TB crawl corpora live on:

- ``file://`` / bare paths — LocalFileSystem;
- ``s3://`` / ``s3a://`` / ``s3n://`` — S3FileSystem (the Hadoop
  scheme aliases normalize to ``s3``). Credentials resolve through
  the standard AWS chain (env, config files, IMDS) by default; any
  ``TAS_S3_*`` environment variable switches to EXPLICIT
  construction — endpoint_override / region / access_key /
  secret_key / session_token / scheme / allow_bucket_creation /
  allow_bucket_deletion / anonymous — the knobs S3-COMPATIBLE stores
  (MinIO, Ceph RGW) and config-driven containers need. This path is
  exercised end to end against a live local S3 server (moto) in
  ``tests/test_s3_live.py``: real AWS C++ SDK HTTP, signatures,
  multipart upload, ranged reads;
- ``gs://`` — GcsFileSystem;
- ``hdfs://`` — HadoopFileSystem via libhdfs (present on real
  clusters; absent in slim containers, where the resolve fails
  LOUDLY with Arrow's "Unable to load libhdfs" rather than
  misreading paths).

Scheme aliasing for tests and air-gapped runs: the environment
variable ``TAS_FS_ALIASES`` (``"mock=file:///tmp/root;cc=s3://bkt/
prefix"``, ``;``-separated) rewrites ``mock://x/y`` to
``file:///tmp/root/x/y`` BEFORE resolution, driver- and
executor-side alike (env vars reach local-mode workers by
inheritance and cluster executors via ``spark.executorEnv.*``). This
lets an end-to-end round trip grade the full URI plumbing — scheme
parse, alias rewrite, pyarrow resolve, list/open/delete through a
``FileSystem`` object — without a live object store in the test
container.

Directory semantics: object stores have no directories, so
``makedirs`` is best-effort (real mkdir on local/HDFS, marker or
no-op on S3/GCS) and listings use ``FileSelector`` which works on
both real directories and key prefixes.
"""

from __future__ import annotations

import io
import os
import re
from typing import Iterable, List, Optional, Tuple

from pyarrow import fs as pafs

__all__ = [
    "ALIAS_ENV", "normalize_uri", "resolve", "open_input_stream",
    "open_input_file", "open_output_stream", "makedirs", "list_files",
    "delete_files", "is_file", "basename", "join",
    "env_snapshot", "apply_env",
]

ALIAS_ENV = "TAS_FS_ALIASES"

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")
#: Hadoop ecosystem scheme names for stores pyarrow spells differently.
_SCHEME_SYNONYMS = {"s3a": "s3", "s3n": "s3", "gcs": "gs"}


def _aliases() -> dict:
    out = {}
    for part in os.environ.get(ALIAS_ENV, "").split(";"):
        k, sep, v = part.partition("=")
        if sep and k.strip():
            out[k.strip()] = v.strip().rstrip("/")
    return out


def normalize_uri(path: str) -> str:
    """Rewrite ``TAS_FS_ALIASES`` schemes and Hadoop scheme synonyms
    (``s3a``/``s3n`` -> ``s3``, ``gcs`` -> ``gs``); other paths pass
    through unchanged. One alias hop only — an alias target is a real
    URI, not another alias."""
    m = _SCHEME_RE.match(path)
    if not m:
        return path
    scheme, rest = m.group(1), path[m.end():]
    alias = _aliases().get(scheme)
    if alias is not None:
        return f"{alias}/{rest}" if rest else alias
    syn = _SCHEME_SYNONYMS.get(scheme)
    if syn is not None:
        return f"{syn}://{rest}"
    return path


#: Environment knobs for explicit S3FileSystem construction (set any
#: to route ``s3://`` URIs through them instead of ``from_uri``'s
#: default-chain resolution). They exist for two deployments the
#: default chain can't reach: S3-COMPATIBLE stores (MinIO, Ceph RGW,
#: moto — need ``endpoint_override`` + ``scheme=http``) and containers
#: whose credentials/region come from the job config rather than the
#: IMDS/env chain. Env vars (not Spark conf) so plain-Python callers
#: need no SparkSession; EXECUTOR workers do NOT reliably inherit
#: them (workers fork from a daemon whose env froze at JVM launch),
#: so executor-bound closures ship an :func:`env_snapshot` and call
#: :func:`apply_env` before resolving — no ``spark.executorEnv.*``
#: plumbing needed on real clusters either.
S3_ENV = {
    "TAS_S3_ENDPOINT": "endpoint_override",
    "TAS_S3_REGION": "region",
    "TAS_S3_ACCESS_KEY": "access_key",
    "TAS_S3_SECRET_KEY": "secret_key",
    "TAS_S3_SESSION_TOKEN": "session_token",
    "TAS_S3_SCHEME": "scheme",  # http for emulators/in-VPC gateways
}
S3_FLAG_ENV = {
    "TAS_S3_ALLOW_BUCKET_CREATION": "allow_bucket_creation",
    "TAS_S3_ALLOW_BUCKET_DELETION": "allow_bucket_deletion",
    "TAS_S3_ANONYMOUS": "anonymous",
}


def s3_options() -> Optional[dict]:
    """S3FileSystem kwargs from the TAS_S3_* environment, or ``None``
    when none are set (then ``from_uri`` + the standard AWS chain
    applies). Exposed for tests to grade the exact constructed
    options. pyarrow 16 fixes the multipart part size internally
    (5 MiB minimum, background multipart upload) — there is no
    threshold knob to plumb."""
    opts = {
        kw: os.environ[env]
        for env, kw in S3_ENV.items()
        if os.environ.get(env)
    }
    for env, kw in S3_FLAG_ENV.items():
        v = os.environ.get(env, "").strip().lower()
        if v:
            opts[kw] = v in ("1", "true", "yes", "on")
    return opts or None


#: Every environment key the seam reads; the unit a snapshot manages.
ENV_KEYS = (ALIAS_ENV, *S3_ENV, *S3_FLAG_ENV)


def env_snapshot() -> dict:
    """Driver-side capture of the seam's environment (aliases +
    TAS_S3_* knobs) for shipping inside task closures.

    Why closures and not inheritance: executor Python workers fork
    from a ``pyspark.daemon`` whose environment froze when the JVM
    launched, so TAS_* values exported on the driver AFTER session
    start — the normal order in notebooks and test harnesses — never
    reach them, and on real clusters executors are different machines
    entirely. A snapshot captured at plan-construction time is pickled
    by value with the kernel and re-applied by :func:`apply_env`,
    making the worker's resolution identical to the driver's with no
    ``spark.executorEnv.*`` deployment plumbing."""
    return {k: os.environ[k] for k in ENV_KEYS if k in os.environ}


def apply_env(snap: Optional[dict]) -> None:
    """Executor-side: make this worker's fs environment match the
    driver snapshot. Managed keys absent from the snapshot are
    REMOVED so reused workers don't leak one job's endpoint or
    credentials into the next job's resolution."""
    if snap is None:
        return
    for k in ENV_KEYS:
        if k in snap:
            os.environ[k] = snap[k]
        else:
            os.environ.pop(k, None)


def resolve(path: str) -> Tuple[pafs.FileSystem, str, str]:
    """Resolve a path/URI to ``(filesystem, fs_path, uri_prefix)``.
    ``uri_prefix + fs_path`` rebuilds a URI that resolves back to the
    same file on any process (driver or executor) — the form listings
    hand to tasks. Bare paths are local (prefix ``""``), so local
    tasks see plain paths exactly as before."""
    p = normalize_uri(path)
    m = _SCHEME_RE.match(p)
    if not m:
        return pafs.LocalFileSystem(), p, ""
    if m.group(1) == "s3":
        opts = s3_options()
        if opts is not None:
            return pafs.S3FileSystem(**opts), p[m.end():], "s3://"
    fs, fs_path = pafs.FileSystem.from_uri(p)
    prefix = "" if m.group(1) == "file" else m.group(1) + "://"
    return fs, fs_path, prefix


def join(path: str, *parts: str) -> str:
    """URI-safe join: always ``/`` (object-store keys and POSIX paths
    both use it), never ``os.sep``."""
    return "/".join([path.rstrip("/"), *parts])


def basename(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[-1]


def open_input_stream(path: str) -> io.BufferedReader:
    """Sequential read stream (buffered), BYTE-TRANSPARENT: pyarrow's
    default ``compression='detect'`` would silently gunzip ``*.gz``
    shards by extension — the connectors own their gzip framing
    (record-per-member), so the seam must hand back raw bytes. A
    missing file raises — the listing or manifest lied; silence would
    under-ingest."""
    fs, p, _ = resolve(path)
    return io.BufferedReader(fs.open_input_stream(p, compression=None))


def open_input_file(path: str):
    """RANDOM-ACCESS (seekable) input file — what ``tarfile`` needs
    to skip member data by seeking."""
    fs, p, _ = resolve(path)
    return fs.open_input_file(p)


def open_output_stream(path: str):
    """Writable output stream; parent created when the store has real
    directories. On object stores this is a streaming multipart
    upload — shard bytes never accumulate in memory."""
    fs, p, _ = resolve(path)
    parent = p.rsplit("/", 1)[0] if "/" in p else ""
    if parent:
        try:
            fs.create_dir(parent, recursive=True)
        except (OSError, NotImplementedError):
            pass  # object stores: no directories to create
    # compression=None: byte-transparent (see open_input_stream).
    return fs.open_output_stream(p, compression=None)


def makedirs(path: str) -> None:
    fs, p, _ = resolve(path)
    try:
        fs.create_dir(p, recursive=True)
    except (OSError, NotImplementedError):
        pass  # object stores: prefixes need no creation


def is_file(path: str) -> bool:
    fs, p, _ = resolve(path)
    return fs.get_file_info(p).type == pafs.FileType.File


def list_files(
    path: str,
    suffixes: Iterable[str],
    prefix: Optional[str] = None,
    recursive: bool = False,
) -> List[str]:
    """List files under ``path`` whose basename matches
    ``prefix*<suffix>`` — the connectors' only globbing need — as
    re-resolvable URIs (scheme preserved for remote stores, plain
    paths for local), sorted. A missing or file-typed ``path`` lists
    to ``[]``; callers decide whether empty is loud."""
    fs, p, uri_prefix = resolve(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.File:
        return [uri_prefix + p]
    if info.type != pafs.FileType.Directory:
        return []
    sufs = tuple(suffixes)
    out = []
    for fi in fs.get_file_info(
        pafs.FileSelector(p, recursive=recursive, allow_not_found=True)
    ):
        if fi.type != pafs.FileType.File:
            continue
        name = basename(fi.path)
        if not name.endswith(sufs):
            continue
        if prefix is not None and not name.startswith(prefix):
            continue
        out.append(uri_prefix + fi.path)
    return sorted(out)


def delete_files(paths: Iterable[str]) -> None:
    for path in paths:
        fs, p, _ = resolve(path)
        fs.delete_file(p)
