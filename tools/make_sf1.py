"""Generate the gitignored .sf1 dataset (all tables) and the .sf10
relational tables — the first two decades of SF1.md's measured-scaling
campaign. (Round 4 built these ad hoc; this commits the recipe so any
session can rebuild the decades from /root/testdata/sf0.1.)

Recipe (SF1.md "How the sf1 data was made"):

- relational tables: deterministic 10x replication with key offsets —
  every primary key, and every foreign key referencing it, is offset
  by ``shard * (1 + max(key))`` consistently, so join fan-outs,
  per-group sizes on fixed domains (l_returnflag, event_type, lang),
  and selectivities are preserved exactly while volume grows 10x.
  ``region``/``nation`` stay fixed (as in TPC-H); ``events.user_id``
  is offset so the user population scales and sessions don't merge
  across shards; timestamps stay untouched (the time axis is a fixed
  domain, like returnflag).
- documents, axis 1: per-shard alphabet rotation (rot_s on a-z) —
  within-shard near-dup structure preserved byte-for-byte, cross-shard
  shingles disjoint. Verbatim replication was measured and REJECTED
  (SF1.md): it makes every doc a 10-clique of exact duplicates, so LSH
  candidate pairs grow ~k^2 and the run measures workload growth, not
  plan scaling.
- embeddings, axis 1: circular component rotation (np.roll by s) —
  norm- and within-shard-cosine preserving, cross-shard buckets
  decorrelate.

The .sf10 doc/embedding tables need the SECOND decorrelation axis and
live in tools/make_scaled_data.py; .sf100 (relational third decade) is
tools/make_sf100.py. Run order:

    python tools/make_sf1.py          # .sf1 all tables + .sf10 relational
    python tools/make_scaled_data.py  # .sf10 documents/embeddings
    python tools/make_sf100.py        # .sf100 relational (optional)

Each writes only missing files.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".sf1")
SF10 = os.path.join(REPO, ".sf10")
SHARDS = 10

# table -> (primary key column, {fk column -> referenced table});
# lineitem's composite key is covered by its FK offsets alone.
TABLES = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        None,
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {"user_id": "__self_user__"}),
}


def replicate_relational(con, src_dir: str, dst_dir: str) -> None:
    """One 10x key-offset replication decade: src_dir -> dst_dir."""
    for t in ("region", "nation"):
        src, dst = (os.path.join(d, f"{t}.parquet") for d in (src_dir, dst_dir))
        if os.path.exists(dst):
            print(f"skip {dst} (exists)")
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}'"
            " (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        print(f"wrote {dst}")

    offsets: dict[str, int] = {}
    for t, (pk, _) in TABLES.items():
        if pk is not None:
            src = os.path.join(src_dir, f"{t}.parquet")
            offsets[t] = 1 + con.execute(
                f"SELECT max({pk}) FROM read_parquet('{src}')"
            ).fetchone()[0]
    src_events = os.path.join(src_dir, "events.parquet")
    offsets["__self_user__"] = 1 + con.execute(
        f"SELECT max(user_id) FROM read_parquet('{src_events}')"
    ).fetchone()[0]

    for t, (pk, fks) in TABLES.items():
        src, dst = (os.path.join(d, f"{t}.parquet") for d in (src_dir, dst_dir))
        if os.path.exists(dst):
            print(f"skip {dst} (exists)")
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        shard_sel = []
        for s in range(SHARDS):
            exprs = []
            for c in cols:
                if pk is not None and c == pk:
                    exprs.append(f"{c} + {s} * {offsets[t]} AS {c}")
                elif c in fks:
                    exprs.append(f"{c} + {s} * {offsets[fks[c]]} AS {c}")
                else:
                    exprs.append(c)
            shard_sel.append(
                "SELECT " + ", ".join(exprs) + f" FROM read_parquet('{src}')"
            )
        q = " UNION ALL ".join(shard_sel)
        con.execute(
            f"COPY ({q}) TO '{dst}' (FORMAT PARQUET, COMPRESSION ZSTD,"
            " ROW_GROUP_SIZE 1048576)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"wrote {dst}: {n} rows")


def rot_text(texts, s: int):
    """Axis-1 per-shard alphabet rotation: a-z chars shift by s mod 26."""
    if s == 0:
        return list(texts)
    joined = "\n".join(texts).encode()
    a = np.frombuffer(joined, dtype=np.uint8).copy()
    alpha = (a >= 97) & (a <= 122)
    a[alpha] = 97 + (a[alpha] - 97 + s) % 26
    return a.tobytes().decode().split("\n")


def scale_documents_sf1() -> None:
    out = os.path.join(SF1, "documents.parquet")
    if os.path.exists(out):
        print(f"skip {out} (exists)")
        return
    t = pq.read_table(os.path.join(SF01, "documents.parquet"))
    base_ids = t.column("doc_id").to_numpy()
    offset = int(base_ids.max()) + 1
    texts = t.column("text").to_pylist()
    shards = [
        pa.table(
            {
                "doc_id": pa.array(base_ids + s * offset, pa.int64()),
                "text": pa.array(rot_text(texts, s), pa.string()),
                "lang": t.column("lang"),
                "source": t.column("source"),
                "n_chars": t.column("n_chars"),
            }
        )
        for s in range(SHARDS)
    ]
    pq.write_table(pa.concat_tables(shards), out)
    print(f"wrote {out}: {t.num_rows * SHARDS} rows")


def scale_embeddings_sf1() -> None:
    out = os.path.join(SF1, "embeddings.parquet")
    if os.path.exists(out):
        print(f"skip {out} (exists)")
        return
    t = pq.read_table(os.path.join(SF01, "embeddings.parquet"))
    base_ids = t.column("vec_id").to_numpy()
    offset = int(base_ids.max()) + 1
    emb = np.stack(
        [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    )
    shards = [
        pa.table(
            {
                "vec_id": pa.array(base_ids + s * offset, pa.int64()),
                "embedding": pa.array(
                    list(np.roll(emb, s, axis=1)), pa.list_(pa.float32())
                ),
                "label": t.column("label"),
            }
        )
        for s in range(SHARDS)
    ]
    pq.write_table(pa.concat_tables(shards), out)
    print(f"wrote {out}: {t.num_rows * SHARDS} rows")


def main() -> None:
    os.makedirs(SF1, exist_ok=True)
    os.makedirs(SF10, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    print("== .sf1 relational ==")
    replicate_relational(con, SF01, SF1)
    print("== .sf1 documents/embeddings (axis 1) ==")
    scale_documents_sf1()
    scale_embeddings_sf1()
    print("== .sf10 relational ==")
    replicate_relational(con, SF1, SF10)
    print("done; now run tools/make_scaled_data.py for .sf10 docs")


if __name__ == "__main__":
    main()
