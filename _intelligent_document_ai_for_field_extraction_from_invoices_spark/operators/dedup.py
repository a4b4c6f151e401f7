"""Deduplication operators for large-scale training-data pipelines.

- exact:   hash-groupBy (one shuffle on the digest, partial agg map-side)
- n-gram:  shingle inverted index -> candidate pairs -> token Jaccard
- MinHash: k independent xxhash64 permutations -> banded LSH bucket join
- SimHash: 64-bit sign-aggregated token hashes (Arrow-batched UDF)

All shuffle keys are digests (uniform — no skew); small sides broadcast.
At 100 TB the shingle index is the big shuffle: keys are md5 digests so the
hash partitioning is balanced by construction, and frequent-shingle hubs are
capped (`max_bucket`) exactly like LSH implementations cap hot buckets."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 bands x 4 rows


def exact_dedup_groups(df: DataFrame, key: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: digest -> canonical (min key) + copy count."""
    return (
        df.select(F.col(key), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(key).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def _shingles(text_col: str, n: int):
    """n-word shingles as md5 digests — native exprs (transform/sequence)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    return F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice(words, i + 1, n), " "))
    )


def shingle_pairs(df: DataFrame, key: str = "doc_id", text_col: str = "text",
                  n: int = 3, min_shared: int = 2,
                  max_bucket: int = 64) -> DataFrame:
    """Candidate near-dup pairs sharing >= min_shared distinct n-gram shingles.

    Inverted-index self-join on the shingle digest; buckets larger than
    `max_bucket` are dropped (hot-shingle cap — the skew guard that keeps the
    self-join from exploding at scale)."""
    ex = (
        df.filter(F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n)
        .select(F.col(key).alias("k"),
                F.explode(F.array_distinct(_shingles(text_col, n))).alias("sh"))
    )
    capped = ex.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("sh"))
    )
    # cache: the frame feeds both sides of the self-join — without it the
    # whole shingle/explode pipeline is recomputed per side
    capped = capped.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n").cache()
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.k") < F.col("b.k")))
        .groupBy(F.col("a.k").alias("doc_a"), F.col("b.k").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def jaccard_pairs(df: DataFrame, pairs: DataFrame, key: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Token-set Jaccard for candidate pairs (ref string-similarity fallback,
    evaluate.py:221-231: intersection/union of token sets)."""
    toks = df.select(
        F.col(key).alias("k"),
        F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+")).alias("toks"),
    ).cache()  # joined twice (doc_a and doc_b sides)
    j = (
        pairs.join(toks.withColumnRenamed("k", "doc_a")
                   .withColumnRenamed("toks", "toks_a"), "doc_a")
        .join(toks.withColumnRenamed("k", "doc_b")
              .withColumnRenamed("toks", "toks_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return j.select(
        "doc_a", "doc_b", "n_shared",
        F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
    )


def minhash_signatures(df: DataFrame, key: str = "doc_id",
                       text_col: str = "text",
                       num_perms: int = MINHASH_PERMS,
                       shingle_n: int = 3) -> DataFrame:
    """MinHash signature per doc: min over n-word shingles of
    xxhash64(shingle, seed_p) for each of `num_perms` seeded permutations —
    all native exprs. Shingles (not unigrams) are the hashed features:
    unigram sets over a small vocabulary are near-identical across documents,
    which would collapse every LSH bucket into one giant skew bucket.

    Plan shape: explode distinct shingles -> one min-aggregate per
    permutation. The per-perm aggregates combine map-side (partial agg), so
    the shuffle carries num_perms values per DOC — a posexplode formulation
    would shuffle num_perms hashed rows per SHINGLE, ~16x the data."""
    toks = df.filter(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= shingle_n
    ).select(
        F.col(key).alias("k"),
        F.explode(
            F.array_distinct(_shingles(text_col, shingle_n))
        ).alias("tok"),
    )
    mins = toks.groupBy("k").agg(*[
        F.min(F.xxhash64(F.col("tok"), F.lit(p))).alias(f"mh{p}")
        for p in range(num_perms)
    ])
    return mins.select(
        F.col("k").alias(key),
        F.array(*[F.col(f"mh{p}") for p in range(num_perms)]).alias("signature"),
    )


def minhash_lsh_pairs(df: DataFrame, key: str = "doc_id",
                      text_col: str = "text", bands: int = LSH_BANDS,
                      num_perms: int = MINHASH_PERMS,
                      min_est_jaccard: float = 0.5,
                      max_bucket: int = 256) -> DataFrame:
    """Banded LSH over MinHash signatures: docs colliding in any band become
    candidate pairs; estimated Jaccard = fraction of matching signature slots.
    Buckets larger than `max_bucket` are dropped before the self-join — the
    skew guard that bounds worst-case pair blowup at scale."""
    rows = num_perms // bands
    sigs = minhash_signatures(df, key, text_col, num_perms)
    banded = sigs.select(
        F.col(key).alias("k"),
        "signature",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(F.concat_ws(
                    ",", F.transform(
                        F.slice("signature", b * rows + 1, rows),
                        lambda x: x.cast("string"),
                    )
                )),
            )
        ).alias("band", "bucket"),
    )
    banded = banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bucket_n") <= max_bucket).drop("bucket_n").cache()
    # cached: both self-join sides would otherwise recompute the full
    # signature pipeline (explode x perms + min-agg) from scratch
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.k") < F.col("b.k")))
        .select(F.col("a.k").alias("doc_a"), F.col("b.k").alias("doc_b"),
                F.col("a.signature").alias("sig_a"),
                F.col("b.signature").alias("sig_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
    ))
    return cand.select(
        "doc_a", "doc_b",
        F.round(matches / F.lit(num_perms), 4).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= min_est_jaccard)


_SIMHASH_SCHEMA = T.LongType()


@F.pandas_udf(_SIMHASH_SCHEMA)
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (md5-derived token hashes —
    deterministic, library-free). Arrow-batched; the token loop is the
    batched inner loop, no per-row Python UDF."""
    import numpy as np  # noqa: PLC0415

    shifts = np.arange(64, dtype=np.uint64)
    out = []
    for t in texts:
        toks = set((t or "").split())
        if not toks:
            out.append(0)
            continue
        hs = np.frombuffer(
            b"".join(hashlib.md5(tok.encode()).digest()[:8] for tok in toks),
            dtype=">u8",
        ).astype(np.uint64)
        bits = (hs[:, None] >> shifts) & np.uint64(1)   # (n_tok, 64)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        v = int(((votes > 0).astype(np.uint64) << shifts).sum())
        # two's complement into signed 64-bit
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pd.Series(out, dtype="int64")


def simhash_near_dups(df: DataFrame, key: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 8) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into 4×16-bit keys
    (pigeonhole: hamming<=3 guarantees a shared band; wider max_hamming is
    best-effort as in production SimHash dedup), then verify hamming."""
    sh = df.select(F.col(key).alias("k"), simhash64(F.col(text_col)).alias("sh"))
    banded = sh.select(
        "k", "sh",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("sh"), 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("band", "bkey"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col("a.k") < F.col("b.k")))
        .select(F.col("a.k").alias("doc_a"), F.col("b.k").alias("doc_b"),
                ham.alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
