"""Adversarial-skew scaling probe (VERDICT r03 next-step #5).

Builds a pathological variant of the sf0.1 fixtures — one near-dup cluster
holding ~10% of documents (which also concentrates one LSH band bucket),
and ~10% of embeddings collapsed onto one hyperplane bucket / IVF cell —
then times the dedup/ANN paths on the control vs the adversarial data and
reports whether runtime stays bounded by EMITTED PAIRS (output-bound, the
design claim) rather than going superlinear in time.

Usage: python tools/skew_probe.py [sf_dir] [out_dir]
Prints one JSON line per measurement; the round artifact is assembled from
these in ARTIFACTS/r04_skew_probe.md.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, ".")

from ai_metadata_lineage_pyspark_spark.registry import all_queries  # noqa: E402
from ai_metadata_lineage_pyspark_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew_probe"

# ~120-token boilerplate template; every hot doc shares it and appends two
# doc-unique tokens, so shingle Jaccard ≈ 0.95 — all hot docs are true
# near-dups of each other and land in the same LSH band buckets.
_TEMPLATE = " ".join(f"boilerplate{i % 40} term{i % 17} word{i}" for i in range(40))

QUERIES = ["minhash_lsh_pairs", "neardup_components", "ann_lsh_topk", "ivf_topk"]


def build_adversarial(spark, src_dir: str, dst_dir: str, hot_frac: float = 0.10) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst_dir, exist_ok=True)
    rng = random.Random(42)

    docs = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    d = docs.to_pylist()
    n_hot = int(len(d) * hot_frac)
    for row in d[:n_hot]:
        row["text"] = f"{_TEMPLATE} unique{row['doc_id']} tail{row['doc_id']}"
        row["n_chars"] = len(row["text"])
    pq.write_table(pa.Table.from_pylist(d, schema=docs.schema),
                   os.path.join(dst_dir, "documents.parquet"))

    embs = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    e = embs.to_pylist()
    n_hot_e = int(len(e) * hot_frac)
    base = e[0]["embedding"]
    for row in e[:n_hot_e]:
        # tiny jitter keeps vectors distinct but in one LSH bucket/IVF cell
        row["embedding"] = [v + rng.uniform(-1e-4, 1e-4) for v in base]
    pq.write_table(pa.Table.from_pylist(e, schema=embs.schema),
                   os.path.join(dst_dir, "embeddings.parquet"))


def timed(spark, name: str, sf_dir: str) -> dict:
    fn = all_queries()[name].fn
    t0 = time.time()
    rows = fn(spark, sf_dir).count()
    return {"query": name, "sf_dir": os.path.basename(sf_dir), "rows": rows,
            "sec": round(time.time() - t0, 3)}


def main() -> int:
    spark = get_spark("skew-probe")
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    build_adversarial(spark, SF_DIR, OUT)

    results = []
    for name in QUERIES:
        # warm-up on control first so codegen/compile cost doesn't pollute
        # the comparison, then measure control and adversarial
        timed(spark, name, SF_DIR)
        ctl = timed(spark, name, SF_DIR)
        adv = timed(spark, name, OUT)
        ratio_t = round(adv["sec"] / max(ctl["sec"], 1e-9), 2)
        ratio_r = round(adv["rows"] / max(ctl["rows"], 1), 2)
        rec = {"query": name, "control_sec": ctl["sec"], "adv_sec": adv["sec"],
               "control_rows": ctl["rows"], "adv_rows": adv["rows"],
               "time_ratio": ratio_t, "rows_ratio": ratio_r}
        print(json.dumps(rec), flush=True)
        results.append(rec)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
