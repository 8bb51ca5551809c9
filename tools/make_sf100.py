"""Generate the gitignored .sf100 relational dataset (600M lineitem /
100M events) for SF1.md's THIRD measured decade.

Same replicate-with-key-offset recipe as the .sf1/.sf10 relational
tables (see tools/make_scaled_data.py and SF1.md "How the sf1 data was
made"): every table's primary key — and every foreign key that
references it — is offset by ``shard * (1 + max(key))`` consistently,
so join fan-outs, per-group sizes on fixed domains (l_returnflag,
event_type, ...), and selectivities are preserved exactly while volume
grows 10x per decade. ``region``/``nation`` stay fixed (as in TPC-H);
``events.user_id``/``event_id`` are offset so the user population
scales and sessions don't merge across shards; timestamps/dates are
left untouched (the time axis is a fixed domain, like returnflag).

Documents/embeddings are intentionally NOT scaled to sf100: each text
decade needs a fresh independent decorrelation axis (SF1.md), and the
doc-side operators already carry two measured decades. The DP
relational core is scan-bound and is the part worth a third decade.

Runs in DuckDB straight to parquet (~600M-row lineitem, a few
minutes, ~15 GB). Usage: python tools/make_sf100.py
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, ".sf10")
SF100 = os.path.join(REPO, ".sf100")
SHARDS = 10

# table -> (primary key column, {fk column -> referenced table})
TABLES = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        None,  # composite (l_orderkey, l_linenumber): offset via FKs only
        {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    ),
    "events": ("event_id", {"user_id": "__self_user__"}),
}


#: Tables written one shard per file into a ``<table>.parquet/``
#: DIRECTORY (Spark reads it identically): a single 600M-row UNION ALL
#: COPY made DuckDB buffer the whole result (~100 GB RSS, nothing
#: flushed); per-shard COPYs bound memory at one shard.
BIG_TABLES = {"lineitem", "events"}


def main() -> None:
    if not os.path.isdir(SF10):
        sys.exit(".sf10 missing — generate it first (see SF1.md)")
    os.makedirs(SF100, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    con.execute("SET memory_limit = '32GB'")

    # Fixed dimension tables: copy through.
    for t in ("region", "nation"):
        src = os.path.join(SF10, f"{t}.parquet")
        dst = os.path.join(SF100, f"{t}.parquet")
        if os.path.exists(dst):
            print(f"skip {dst} (exists)")
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}'"
            " (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        print(f"wrote {dst}")

    # Per-key offsets = 1 + max(key) in the SOURCE decade, so shard s
    # adds s*offset to the key and to every FK referencing it.
    offsets: dict[str, int] = {}
    for t, (pk, _) in TABLES.items():
        if pk is not None:
            src = os.path.join(SF10, f"{t}.parquet")
            offsets[t] = 1 + con.execute(
                f"SELECT max({pk}) FROM read_parquet('{src}')"
            ).fetchone()[0]
    src_events = os.path.join(SF10, "events.parquet")
    offsets["__self_user__"] = 1 + con.execute(
        f"SELECT max(user_id) FROM read_parquet('{src_events}')"
    ).fetchone()[0]

    for t, (pk, fks) in TABLES.items():
        src = os.path.join(SF10, f"{t}.parquet")
        dst = os.path.join(SF100, f"{t}.parquet")
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
                "SELECT "
                + ", ".join(exprs)
                + f" FROM read_parquet('{src}')"
            )
        if t in BIG_TABLES:
            os.makedirs(dst, exist_ok=True)
            for s, q in enumerate(shard_sel):
                part = os.path.join(dst, f"part-{s:02d}.parquet")
                con.execute(
                    f"COPY ({q}) TO '{part}' (FORMAT PARQUET,"
                    " COMPRESSION ZSTD, ROW_GROUP_SIZE 1048576)"
                )
                print(f"  shard {s} -> {part}")
            glob_src = os.path.join(dst, "*.parquet")
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{glob_src}')"
            ).fetchone()[0]
        else:
            q = " UNION ALL ".join(shard_sel)
            con.execute(
                f"COPY ({q}) TO '{dst}' (FORMAT PARQUET, COMPRESSION ZSTD,"
                " ROW_GROUP_SIZE 1048576)"
            )
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')"
            ).fetchone()[0]
        print(f"wrote {dst}: {n} rows")


if __name__ == "__main__":
    main()
