"""Deterministic scale-up of the driver testdata: sfX = K x sf0.1 via
key-shifted replication, preserving referential integrity and schema.

The driver provides sf{0.001,0.01,0.1} read-only; the sf1 gate (100x
the driver's sf0.01 gate scale) needs a 10x-larger coherent dataset.
Copy k shifts every key domain by k * domain_cardinality (keys are
dense 0..N-1 in the source), so orders still join their copy's
customers, lineitems their copy's orders/parts/suppliers. The tiny
dims (region, nation) are shared, TPC-H-style. Text gets a per-copy
suffix token and embeddings a per-copy dim-0 offset so replicas are
near- (not exact-) duplicates — keeping dedup/ANN behavior realistic
— with n_chars recomputed. Everything is a pure function of the
source data and k: re-running reproduces byte-identical parquet.

Usage: python scripts/make_sf.py [k] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 <repo>/testdata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(repo, "testdata", "sf1")
    os.makedirs(out, exist_ok=True)

    def load(name):
        return pq.read_table(f"{src}/{name}.parquet")

    def save(name, tbl):
        pq.write_table(tbl, f"{out}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows")

    # shared dims: copied through unchanged
    for dim in ("region", "nation"):
        save(dim, load(dim))

    def shift(col: pa.ChunkedArray, base: int, copy: int) -> pa.Array:
        a = col.combine_chunks().to_numpy(zero_copy_only=False)
        return pa.array(a + base * copy, type=col.type)

    def replicate(name: str, key_bases: dict[str, int], fix=None):
        t = load(name)
        parts = []
        for c in range(k):
            cols = {}
            for field in t.schema.names:
                col = t.column(field)
                if field in key_bases:
                    cols[field] = shift(col, key_bases[field], c)
                else:
                    cols[field] = col.combine_chunks()
            if fix is not None:
                cols = fix(cols, c)
            parts.append(pa.table(cols, schema=t.schema))
        save(name, pa.concat_tables(parts))

    C, S, P, O = 15_000, 1_000, 20_000, 150_000
    D, V, E, U = 5_000, 2_000, 100_000, 1_500

    replicate("customer", {"c_custkey": C})
    replicate("supplier", {"s_suppkey": S})
    replicate("part", {"p_partkey": P})
    replicate("orders", {"o_orderkey": O, "o_custkey": C})
    replicate(
        "lineitem", {"l_orderkey": O, "l_partkey": P, "l_suppkey": S}
    )
    replicate("events", {"event_id": E, "user_id": U})

    def fix_docs(cols, c):
        if c == 0:
            return cols
        texts = cols["text"].to_pylist()
        texts = [f"{t} c{c}" for t in texts]
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array(
            [len(t) for t in texts], type=cols["n_chars"].type
        )
        return cols

    replicate("documents", {"doc_id": D}, fix=fix_docs)

    def fix_emb(cols, c):
        if c == 0:
            return cols
        emb = cols["embedding"]
        vals = np.stack(
            [np.asarray(v, dtype=np.float32) for v in emb.to_pylist()]
        )
        vals[:, 0] += np.float32(0.01 * c)
        cols["embedding"] = pa.array(
            [row for row in vals], type=emb.type
        )
        return cols

    replicate("embeddings", {"vec_id": V}, fix=fix_emb)


if __name__ == "__main__":
    main()
