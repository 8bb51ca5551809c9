"""Round-10 decade re-measure campaign (r9 verdict #2 and #6).

Re-measures the pre-r9 decade tables under the NOOP materializer
(rounds 4-8 used df.count(), which let Catalyst prune the aggregate
expressions many keys exist to measure), plus the first sf10 spot
sweep of the archive/streaming family. One bench.py invocation per
(sf_dir, key-family) so each runs in a fresh session; results land in
/tmp/decade_r10/<name>.json (the headline+chunk lines of stdout).

Run AFTER any sf0.1 bench has finished — never two Spark sessions
concurrently when timing.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/decade_r10"

DP_TEMPORAL = (
    "groupby_count_keyset,sum_clamped,average_clamped,variance_clamped,"
    "stdev_clamped,count_distinct,public_join_count,private_join_count,"
    "private_join_nonunique,quantile_median,multi_quantile,min_max,"
    "histogram,get_bounds,ids_truncated_count,groups_per_id_count,"
    "funnel_stats,retention_cohorts,range_join_count,"
    "interval_overlap_count,asof_join_gap"
)
DOCS_AGG = (
    "html_extract_stats,sentence_stats,c4_line_filter_stats,"
    "quantile_sketch_rollup,substring_dedup_stats,"
    "span_decontamination_stats,epoch_shuffle_stats,greedy_pack_stats,"
    "zipf_slope,top_ngrams,token_stats,quality_stats,gopher_flags,"
    "repetition_stats,char_entropy_stats,pii_stats,"
    "winnow_fingerprint_stats,ngram_contamination,heaps_law_stats"
)
ARCHIVE_STREAMING = (
    "archive_fs_roundtrip_stats,crawl_funnel_stats,crawl_prep_stats,"
    "warc_http_framing_stats,warc_ingest_stats,wat_roundtrip_stats,"
    "wet_roundtrip_stats,streaming_warc_ingest,streaming_wet_publish,"
    "streaming_incremental_dedup,streaming_hourly_rollup"
)

#: sf100 keeps only the scan-bound codegen keys: the honest (noop)
#: cost of the exact-gram family is ~1 ms/doc-core (substring dedup
#: 55 s at 50k docs), so its sf100 (5M docs) single-node measurement
#: would be hours per key — the sf1->sf10 slope is the evidence, and
#: SF1.md documents the extrapolation instead of a fake number.
DOCS_SF100 = (
    "html_extract_stats,sentence_stats,c4_line_filter_stats,"
    "quantile_sketch_rollup,epoch_shuffle_stats,greedy_pack_stats,"
    "zipf_slope,token_stats,quality_stats,gopher_flags,"
    "repetition_stats,char_entropy_stats,pii_stats"
)

#: (name, sf_dir, keys, extra_env)
RUNS = [
    ("dp_sf10", ".sf10", DP_TEMPORAL, {}),
    ("dp_sf100", ".sf100", DP_TEMPORAL,
     {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "256"}),
    ("docs_sf1", ".sf1", DOCS_AGG, {}),
    ("docs_sf10", ".sf10", DOCS_AGG, {}),
    ("docs_sf100", ".sf100", DOCS_SF100, {}),
    ("arch_sf1", ".sf1", ARCHIVE_STREAMING, {}),
    ("arch_sf10", ".sf10", ARCHIVE_STREAMING, {}),
]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    picked = sys.argv[1:] or [r[0] for r in RUNS]
    for name, sf, keys, extra in RUNS:
        if name not in picked:
            continue
        dst = os.path.join(OUT, f"{name}.json")
        if os.path.exists(dst):
            print(f"skip {name} (exists)", flush=True)
            continue
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = os.path.join(HERE, sf)
        env["SPARK_GRAFT_ONLY"] = keys
        env.update(extra)
        print(f"=== {name} ({sf}) ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        lines = [
            l for l in proc.stdout.splitlines() if l.startswith("{")
        ]
        with open(dst, "w") as f:
            f.write("\n".join(lines) + "\n")
        for l in proc.stderr.splitlines():
            if l.startswith("# done") or "FAILED" in l:
                print(l, flush=True)
        tail = [json.loads(l) for l in lines]
        per = {}
        for obj in tail:
            per.update(obj.get("queries", {}) if obj.get("metric") ==
                       "queries_chunk" else {})
        print(json.dumps({name: per}, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
