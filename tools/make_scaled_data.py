"""Generate the gitignored scale-up datasets (.sf1 / .sf10) used by
SF1.md's measured-scaling tables.

Round 4 produced .sf1 (all tables, 10x sf0.1) and a relational-only
.sf10 with ad-hoc DuckDB; this script commits the recipe and adds the
piece round 4 couldn't: a SECOND independent decorrelation axis for
documents and embeddings, so the doc-side operators get a measured
second decade too (r4 verdict #5).

Why decorrelation matters: verbatim replication makes every document a
k-clique of exact duplicates, so LSH/dedup candidate pairs grow ~k^2
and the run measures workload growth, not plan scaling (SF1.md records
the rejected experiment). Each 10x decade therefore needs a transform
that PRESERVES within-shard structure byte-for-byte while making
cross-shard shingles/buckets disjoint:

- axis 1 (sf0.1 -> sf1, round 4): per-shard alphabet rotation
  ``rot_j`` on text; circular component rotation on embeddings.
- axis 2 (sf1 -> sf10, this script): position-dependent word rotation
  ``char at 1-based in-word position p -> char + s*p (mod 26)`` —
  OUTSIDE the cyclic rotation group, so composing with axis 1 can't
  alias: shard (j, s) equals shard (j', s') only if j=j' and s=s'
  (for words of length >= 2, since (s-s')*p = const mod 26 for all p
  forces s=s'). Word lengths, whitespace, n_chars, lang/source are all
  preserved, so quality metrics and group cardinalities are untouched.
  Embeddings get per-shard deterministic SIGN FLIPS (orthogonal:
  norms and within-shard cosines exact), which compose with axis 1's
  rotations without aliasing (flip pattern identifies the shard).

- axis 3 (sf10 -> sf100, round 6): QUADRATIC position shift ``char at
  1-based in-word position p -> char + t*p^2 (mod 26)``. Composed
  shift across all axes is ``j + s*p + t*p^2``: two shard triples
  (j,s,t) != (j',s',t') agreeing on every p >= 1 would need 2*(t-t')
  = 0 mod 26, i.e. t-t' in {0, +-13} — impossible with per-axis shard
  indices 0..9 — so words of length >= 3 are disjoint across shards
  (length-1/2 words share axis 2's caveat). Embeddings get a SECOND
  independent sign-flip family (different hash constants); a product
  of two sign patterns is another sign pattern, and with 64 dims the
  probability any two composed patterns coincide is ~2^-64.

ids offset by ``shard * (1 + max(id))`` as in the relational tables.

Usage: python tools/make_scaled_data.py  (writes only missing files;
~30 s for .sf10, ~6 min for .sf100). Needs /root/repo/.sf1 to exist
with documents/embeddings; .sf100 additionally needs .sf10.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".sf1")
SF10 = os.path.join(REPO, ".sf10")
SHARDS = 10


def word_rotate(texts, s: int, quadratic: bool = False):
    """Apply the axis-2 (``s*p``) or axis-3 (``quadratic=True``,
    ``s*p^2``) vocabulary bijection to every string: each a-z char at
    1-based position p within its word shifts by the rule (mod 26).
    Deterministic per word (all occurrences map identically), length-
    preserving, and a bijection on words for each s. Vectorized: one
    numpy pass over the shard's concatenated bytes."""
    if s == 0:
        return list(texts)
    joined = "\n".join(texts).encode()
    a = np.frombuffer(joined, dtype=np.uint8).copy()
    alpha = (a >= 97) & (a <= 122)
    idx = np.arange(len(a), dtype=np.int64)
    # last non-alpha position at or before each index (-1 if none):
    boundary = np.where(~alpha, idx, -1)
    np.maximum.accumulate(boundary, out=boundary)
    p = idx - boundary  # 1-based position within the current word
    rot = (s * p * p) % 26 if quadratic else (s * p) % 26
    a[alpha] = 97 + (a[alpha] - 97 + rot[alpha]) % 26
    return a.tobytes().decode().split("\n")


def sign_pattern(s: int, dim: int, family: int = 0) -> np.ndarray:
    """Deterministic per-shard sign-flip vector (+-1), identity at s=0.
    ``family=1`` is the independent axis-3 hash family."""
    if s == 0:
        return np.ones(dim, dtype=np.float32)
    i = np.arange(dim, dtype=np.uint64)
    mults = ((0x9E3779B1, 0x85EBCA77), (0xC2B2AE3D, 0x27D4EB2F))[family]
    h = (np.uint64(s) * np.uint64(mults[0]) + i * np.uint64(mults[1])) >> np.uint64(13)
    return np.where(h & np.uint64(1), -1.0, 1.0).astype(np.float32)


def scale_documents(src_dir=None, dst_dir=None, quadratic=False) -> None:
    out = os.path.join(dst_dir or SF10, "documents.parquet")
    if os.path.exists(out):
        print(f"skip {out} (exists)")
        return
    t = pq.read_table(os.path.join(src_dir or SF1, "documents.parquet"))
    n = t.num_rows
    base_ids = t.column("doc_id").to_numpy()
    offset = int(base_ids.max()) + 1
    texts = t.column("text").to_pylist()
    shards = []
    for s in range(SHARDS):
        shards.append(
            pa.table(
                {
                    "doc_id": pa.array(base_ids + s * offset, pa.int64()),
                    "text": pa.array(
                        word_rotate(texts, s, quadratic), pa.string()
                    ),
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "n_chars": t.column("n_chars"),
                }
            )
        )
        print(f"documents shard {s}: {n} rows")
    pq.write_table(pa.concat_tables(shards), out)
    print(f"wrote {out}")


def scale_embeddings(src_dir=None, dst_dir=None, family=0) -> None:
    out = os.path.join(dst_dir or SF10, "embeddings.parquet")
    if os.path.exists(out):
        print(f"skip {out} (exists)")
        return
    t = pq.read_table(os.path.join(src_dir or SF1, "embeddings.parquet"))
    base_ids = t.column("vec_id").to_numpy()
    offset = int(base_ids.max()) + 1
    emb = np.stack(
        [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    )
    labels = t.column("label")
    dim = emb.shape[1]
    shards = []
    for s in range(SHARDS):
        flipped = emb * sign_pattern(s, dim, family)[None, :]
        shards.append(
            pa.table(
                {
                    "vec_id": pa.array(base_ids + s * offset, pa.int64()),
                    "embedding": pa.array(
                        list(flipped), pa.list_(pa.float32())
                    ),
                    "label": labels,
                }
            )
        )
        print(f"embeddings shard {s}: {t.num_rows} rows")
    pq.write_table(pa.concat_tables(shards), out)
    print(f"wrote {out}")


def main() -> None:
    if not os.path.isdir(SF1):
        sys.exit(".sf1 missing — see SF1.md for the axis-1 recipe")
    os.makedirs(SF10, exist_ok=True)
    scale_documents()
    scale_embeddings()
    sf100 = os.path.join(REPO, ".sf100")
    os.makedirs(sf100, exist_ok=True)
    scale_documents(SF10, sf100, quadratic=True)
    scale_embeddings(SF10, sf100, family=1)


if __name__ == "__main__":
    main()
