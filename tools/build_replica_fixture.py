"""Build a ~10x ("sf1") replica fixture for a FULL-REGISTRY ORACLE SWEEP
(r9 verdict #2): correctness evidence previously topped out at sf0.1 —
the 10x/30x probes measured shuffle/spill shape but never VALUE-checked
both engines at scale. This tool materializes a consistent 10x fixture
(default /tmp/testdata_sf1) that `tools/check_oracle.py` can sweep.

Replication scheme (extends tools/scale_probe.py's, which only scales the
corpus tables, to the relational ones so TPC-H sweeps at 10x too):
* documents — per-replica Caesar-shifted text (bijective letter map:
  within-replica near-dup/LSH structure preserved exactly, replicas
  mutually dissimilar), doc_id strided;
* events — event_id/user_id strided (10x users, same per-user chains);
* embeddings — vec_id strided, and each replica's vectors get a CYCLIC
  DIMENSION ROTATION (roll by r*7 mod 64): a permutation is orthogonal,
  so every within-replica dot product/norm is bit-identical to the base
  fixture's (all registered geometry preserved), while cross-replica
  vector pairs stop being exact duplicates — vector REUSE made
  cos(v, v') hit the 1.0 FP boundary, where Spark's fold yields
  1.0000000000000002 and DuckDB's list_cosine_similarity yields 1.0
  (the one cross-engine divergence the first sf1 sweep caught);
* customer/orders/lineitem/part/supplier — every surrogate FK strided by
  the same constant so joins stay replica-local and per-key cardinalities
  match production shape; nation/region are fixed dimension enums and are
  symlinked unchanged.
STRIDE = 10,000,000 is divisible by every mod-based sampling the registry
uses (% 50 query sets, % 100 centroids, % 50 eval slices), so strided
replicas reproduce the base fixture's sampling densities.

Usage: python tools/build_replica_fixture.py [replicas] [src_sf_dir] [dst]
"""

from __future__ import annotations

import os
import string
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else "/tmp/testdata_sf1"
STRIDE = 10_000_000

# per-table strided key columns; tables absent here replicate link-only
_STRIDED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
_LINKED = ["nation", "region"]


def _caesar(r: int):
    """Bijective per-replica character map. For r < 26 this is the original
    pure Caesar shift (so rebuilding the sf1 fixture reproduces the r11
    evidence byte-for-byte). Beyond 26 replicas a pure shift repeats —
    replicas r and r+26 would carry EXACT duplicate text under new doc_ids,
    which is a corpus-shape change, not a scale-up — so r >= 26 composes an
    AFFINE letter map (x -> a*x + b mod 26, a coprime to 26: still a
    bijection, so all within-replica shingle/near-dup structure is
    preserved exactly) plus a digit Caesar keyed to the 26-block. Distinct
    maps for every r < 12*26 = 312 replicas."""
    lower = string.ascii_lowercase
    digits = string.digits
    block, shift = divmod(r, 26)
    # multipliers coprime to 26; block 0 keeps a=1 (the original shift map)
    a = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)[block % 12]
    shifted = "".join(lower[(a * i + shift) % 26] for i in range(26))
    dshift = digits[block % 10 :] + digits[: block % 10]
    return str.maketrans(
        lower + lower.upper() + digits, shifted + shifted.upper() + dshift
    )


def _replicate_strided(table: pa.Table, keys: list[str]) -> pa.Table:
    reps = [
        pa.table(
            {
                c: (
                    pc.add(table.column(c), r * STRIDE)
                    if c in keys
                    else table.column(c)
                )
                for c in table.column_names
            }
        )
        for r in range(REPLICAS)
    ]
    return pa.concat_tables(reps)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for t in _LINKED:
        src = os.path.join(SF, f"{t}.parquet")
        link = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(link):
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
    pq.write_table(pa.concat_tables(reps), os.path.join(DST, "documents.parquet"))
    print(f"documents: {docs.num_rows} x {REPLICAS} (caesar-shifted)")

    for t, keys in _STRIDED.items():
        if t in ("documents", "embeddings"):
            continue
        src = os.path.join(SF, f"{t}.parquet")
        table = pq.read_table(src)
        out = _replicate_strided(table, keys)
        pq.write_table(out, os.path.join(DST, f"{t}.parquet"))
        print(f"{t}: {table.num_rows} x {REPLICAS} strided on {keys}")

    import numpy as np

    em = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    mat = np.array(em.column("embedding").to_pylist(), dtype=np.float32)
    emb_type = em.schema.field("embedding").type
    reps = []
    for r in range(REPLICAS):
        rolled = np.roll(mat, r * 7 % mat.shape[1], axis=1)
        # the cyclic roll repeats after `dim` replicas (r and r+64 would be
        # EXACT duplicate vectors — the documented cos=1.0 FP-boundary
        # divergence); compose a SIGN FLIP on the first (r*7 // dim)
        # dimensions so (roll, flip-width) <-> r*7 is bijective and every
        # replica's map is distinct for r*7 < 64*dim. A diagonal +-1 matrix
        # is orthogonal, so every within-replica dot product / norm stays
        # bit-identical. No-op while r*7 < dim — in particular for the
        # 10-replica sf1 fixture, whose rebuilds stay byte-identical to the
        # r11 evidence.
        block = (r * 7) // mat.shape[1]
        if block:
            rolled = rolled.copy()
            rolled[:, :block] = -rolled[:, :block]
        reps.append(
            pa.table(
                {
                    "vec_id": pc.add(em.column("vec_id"), r * STRIDE),
                    "embedding": pa.array(
                        [row.tolist() for row in rolled], type=emb_type
                    ),
                    "label": em.column("label"),
                }
            )
        )
    pq.write_table(pa.concat_tables(reps), os.path.join(DST, "embeddings.parquet"))
    print(f"embeddings: {em.num_rows} x {REPLICAS} (dim-rotated, vec_id strided)")


if __name__ == "__main__":
    main()
