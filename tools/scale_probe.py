"""~sf1 scaling probe (VERDICT r04 next-step #5): 10x the bench-scale data
on the same local[32] session, timing the top-5 cost queries and recording
shuffle-write and spill bytes per query from the Spark status REST API.

Replication design (key differences from the r03 8x probe):
* documents: per-replica Caesar-shifted text (a bijective letter map), so
  WITHIN-replica near-dup structure is preserved exactly while replicas are
  mutually dissimilar — LSH pairs grow ~linearly (10x), matching a real
  corpus 10x larger, instead of the quadratic exact-copy blow-up the r03
  probe measured (which stress-tested output-boundedness instead).
* events: event_id/user_id strided per replica -> 10x users with the same
  per-user chain/session shape; timestamps untouched.
* embeddings: vec_id strided (stride % 50 == 0 keeps the query-set density
  of cosine_topk); vectors reused, which only affects cosine VALUES, not
  work volume.

Usage: python tools/scale_probe.py [replicas] [sf_dir] [out_dir]
Prints one JSON line per measurement; the artifact is assembled into
ARTIFACTS/r05_scaling_probe.md.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time
import urllib.request

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, ".")

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_probe_10x"
STRIDE = 10_000_000  # divisible by 50: preserves cosine_topk's query set

QUERIES = [
    "event_chain_closure",
    "streaming_session_window",
    "corpus_curation",
    "minhash_lsh_pairs",
    "cosine_topk",
    # round-5 additions that touch the replicated tables (documents /
    # embeddings): the corpus-statistics LM filter (bigram-keyed join),
    # the dedup-cluster canonical pick (components + doc join), k-means
    # assignment (broadcast centroids), and the quantization census
    # (pure scan) — the four new shapes whose scaling is worth probing.
    "lm_bigram_doc_score",
    "neardup_canonical_pick",
    "kmeans_assign",
    "embedding_quantize_int8",
    # round-6 addition: the two-ranker fusion (postings probe + KNN +
    # full-outer top-k join) — its query set grows with the corpus, so the
    # scaling of |Q|·k intermediates is worth watching
    "hybrid_search_rrf",
    # round-6 addition: the Bloom probe's m-bounded broadcast claim — the
    # eval side must stay a <=2^20-position broadcast while the train side
    # scales
    "bloom_decontam",
]

# supplemental runs (e.g. probing just the current round's additions
# against an already-built replica) can override the list without
# re-measuring everything: SPARK_GRAFT_PROBE_QUERIES=a,b,c
if os.environ.get("SPARK_GRAFT_PROBE_QUERIES"):
    QUERIES = os.environ["SPARK_GRAFT_PROBE_QUERIES"].split(",")

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _caesar(r: int):
    lower = string.ascii_lowercase
    shifted = lower[r % 26 :] + lower[: r % 26]
    return str.maketrans(lower + lower.upper(), shifted + shifted.upper())


def build(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in _TABLES:
        src = os.path.join(SF, f"{t}.parquet")
        if t not in ("documents", "events", "embeddings") and os.path.exists(src):
            link = os.path.join(dst, f"{t}.parquet")
            if not os.path.exists(link):
                os.symlink(src, link)

    docs = pq.read_table(os.path.join(SF, "documents.parquet"))
    texts = docs.column("text").to_pylist()
    reps = []
    for r in range(REPLICAS):
        tr = _caesar(r)
        reps.append(
            pa.table(
                {
                    "doc_id": pc.add(docs.column("doc_id"), r * STRIDE),
                    "text": pa.array([s.translate(tr) for s in texts]),
                    "lang": docs.column("lang"),
                    "source": docs.column("source"),
                    "n_chars": docs.column("n_chars"),
                }
            )
        )
    pq.write_table(pa.concat_tables(reps), os.path.join(dst, "documents.parquet"))

    ev = pq.read_table(os.path.join(SF, "events.parquet"))
    # stride only the id keys; every other column (event_type, ts, value,
    # props, ...) replicates unchanged so value-dependent operators (e.g.
    # grouped_agg_pandas_udf's cents fold) see the full production schema
    reps = [
        pa.table(
            {
                c: (
                    pc.add(ev.column(c), r * STRIDE)
                    if c in ("event_id", "user_id")
                    else ev.column(c)
                )
                for c in ev.column_names
            }
        )
        for r in range(REPLICAS)
    ]
    pq.write_table(pa.concat_tables(reps), os.path.join(dst, "events.parquet"))

    em = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    reps = [
        pa.table(
            {
                "vec_id": pc.add(em.column("vec_id"), r * STRIDE),
                "embedding": em.column("embedding"),
                "label": em.column("label"),
            }
        )
        for r in range(REPLICAS)
    ]
    pq.write_table(pa.concat_tables(reps), os.path.join(dst, "embeddings.parquet"))


class StageMetrics:
    """Delta-reads completed-stage metrics from the status REST API."""

    def __init__(self, spark):
        self.base = None
        try:
            ui = spark.sparkContext._jsc.sc().uiWebUrl()
            if ui.isDefined():
                app_id = spark.sparkContext.applicationId
                self.base = f"{ui.get()}/api/v1/applications/{app_id}/stages"
        except Exception:
            pass
        self.seen: set[tuple[int, int]] = set()
        self.snapshot()  # baseline

    def snapshot(self) -> dict:
        if self.base is None:
            return {}
        try:
            with urllib.request.urlopen(f"{self.base}?status=complete", timeout=10) as r:
                stages = json.load(r)
        except Exception:
            return {}
        agg = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
               "spill_memory_bytes": 0, "spill_disk_bytes": 0, "input_bytes": 0}
        for s in stages:
            key = (s["stageId"], s["attemptId"])
            if key in self.seen:
                continue
            self.seen.add(key)
            agg["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
            agg["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
            agg["spill_memory_bytes"] += s.get("memoryBytesSpilled", 0)
            agg["spill_disk_bytes"] += s.get("diskBytesSpilled", 0)
            agg["input_bytes"] += s.get("inputBytes", 0)
        return agg


def main() -> int:
    # UI on for the REST metrics; must be set before the session exists
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("scale-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )

    from ai_metadata_lineage_pyspark_spark.functions.cache import release_persisted
    from ai_metadata_lineage_pyspark_spark.registry import all_queries

    t0 = time.time()
    if not os.path.exists(os.path.join(OUT, "documents.parquet")):
        build(OUT)
        print(f"# built {REPLICAS}x fixture at {OUT} in {time.time() - t0:.0f}s",
              flush=True)

    qs = all_queries()
    metrics = StageMetrics(spark)
    for sf_label, d in (("sf0.1", SF), (f"{REPLICAS}x", OUT)):
        for name in QUERIES:
            # two executions per cell: run 0 carries this plan's one-time
            # codegen/JIT compile (a per-host constant — see
            # ARTIFACTS/r05_bench_host_note.md), run 1 is steady-state plan
            # throughput, which is the number the scaling ratio should use.
            for run in (0, 1):
                release_persisted()
                metrics.snapshot()
                t = time.time()
                rows = qs[name].fn(spark, d).count()
                wall = time.time() - t
                m = metrics.snapshot()
                print(json.dumps({"query": name, "data": sf_label, "run": run,
                                  "sec": round(wall, 2), "rows": rows, **m}),
                      flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
