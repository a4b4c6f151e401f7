"""Deterministic sf1 (10x sf0.1) bench staging set -> /root/repo/.bench_sf1.

The driver ships sf0.001/0.01/0.1 only; the round-2 verdict asks for one
bench entry at 10x the bench scale. This derives it from sf0.1, seeded, with
the property that matters for honest scaling numbers: PER-ITEM near-duplicate
density stays constant as the corpus grows (a 10x crawl has ~10x the near-dup
pairs, not 100x), so every headline query's work scales linearly:

- region/nation: copied verbatim (fixed dimensions)
- customer/part/supplier/orders/lineitem: tiled 10x with key shifts that
  preserve FK fan-out (replica k shifts every key by k * (max_key + 1))
- events: tiled 10x; user_id/event_id shifted, ts shifted +35 days per
  replica so sessions and hourly windows replicate instead of colliding
- documents: replica 0 is sf0.1 verbatim; replicas 1-9 are fresh seeded
  bag-of-words docs over a replica-suffixed vocabulary with the base
  corpus's per-doc word counts and lang/source columns — each replica has
  sf0.1's internal near-dup density, no cross-replica near-dups
- embeddings: replica 0 verbatim; replicas 1-9 add seeded N(0, 0.05^2)
  noise per component (cluster structure kept, exact duplicates avoided)

Usage:  python bench/gen_sf1.py   # idempotent, ~50k docs / 6M lineitem
Then:   SPARK_GRAFT_SF_DIR=/root/repo/.bench_sf1 python bench.py
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench_sf1")
REPLICAS = 10
SEED = 42


def _tile_with_key_shift(name: str, key_cols: list[str],
                         ts_cols: dict[str, int] | None = None) -> None:
    t = pq.read_table(f"{BASE}/{name}.parquet")
    shift = {k: int(pa.compute.max(t[k]).as_py()) + 1 for k in key_cols}
    parts = []
    for k in range(REPLICAS):
        cols = {}
        for field in t.schema.names:
            col = t[field]
            if field in shift and k > 0:
                col = pa.compute.add(col, shift[field] * k)
            elif ts_cols and field in ts_cols and k > 0:
                col = pa.compute.add(
                    col, pa.scalar(k * ts_cols[field] * 86_400_000_000,
                                   type=pa.duration("us")))
            cols[field] = col
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), f"{OUT}/{name}.parquet")


def _documents() -> None:
    t = pq.read_table(f"{BASE}/documents.parquet")
    base_text = t["text"].to_pylist()
    base_lang = t["lang"].to_pylist()
    base_source = t["source"].to_pylist()
    n = len(base_text)
    vocab = sorted({w for s in base_text for w in (s or "").split()})
    word_counts = [len((s or "").split()) for s in base_text]

    doc_id, text, lang, source, n_chars = [], [], [], [], []
    for k in range(REPLICAS):
        rng = np.random.RandomState(SEED + k)
        vk = vocab if k == 0 else [f"{w}r{k}" for w in vocab]
        for i in range(n):
            if k == 0:
                s = base_text[i]
            else:
                idx = rng.randint(0, len(vk), size=word_counts[i])
                s = " ".join(vk[j] for j in idx)
            doc_id.append(k * n + i)
            text.append(s)
            lang.append(base_lang[i])
            source.append(base_source[i])
            n_chars.append(len(s or ""))
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_id, type=pa.int64()),
        "text": pa.array(text, type=pa.string()),
        "lang": pa.array(lang, type=pa.string()),
        "source": pa.array(source, type=pa.string()),
        "n_chars": pa.array(n_chars, type=pa.int64()),
    }), f"{OUT}/documents.parquet")


def _embeddings() -> None:
    t = pq.read_table(f"{BASE}/embeddings.parquet")
    base = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    labels = np.array(t["label"].to_pylist(), dtype=np.int32)
    n, dim = base.shape
    vecs, vec_id, label = [], [], []
    for k in range(REPLICAS):
        rng = np.random.RandomState(SEED + 100 + k)
        v = base if k == 0 else (
            base + rng.normal(0.0, 0.05, size=base.shape)).astype(np.float32)
        vecs.append(v)
        vec_id.append(np.arange(n, dtype=np.int64) + k * n)
        label.append(labels)
    allv = np.concatenate(vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.concatenate(vec_id)),
        "embedding": pa.array(list(allv), type=pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(label)),
    }), f"{OUT}/embeddings.parquet")


def main() -> None:
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    for name in ("region", "nation"):
        shutil.copyfile(f"{BASE}/{name}.parquet", f"{OUT}/{name}.parquet")
    _tile_with_key_shift("customer", ["c_custkey"])
    _tile_with_key_shift("part", ["p_partkey"])
    _tile_with_key_shift("supplier", ["s_suppkey"])
    _tile_with_key_shift("orders", ["o_orderkey", "o_custkey"])
    _tile_with_key_shift("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    _tile_with_key_shift("events", ["event_id", "user_id"],
                         ts_cols={"ts": 35})
    _documents()
    _embeddings()
    sizes = {f: pq.read_metadata(f"{OUT}/{f}.parquet").num_rows
             for f in ("documents", "embeddings", "lineitem", "orders",
                       "events", "customer")}
    print({"out": OUT, "rows": sizes})


if __name__ == "__main__":
    main()
