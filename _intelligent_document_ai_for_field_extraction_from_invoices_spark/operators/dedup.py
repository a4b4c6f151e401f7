"""Deduplication operators for large-scale training-data pipelines.

- exact:   hash-groupBy (one shuffle on the digest, partial agg map-side)
- n-gram:  shingle inverted index -> candidate pairs -> token Jaccard
- MinHash: k seeded permutations (md5- or xxhash64-derived) -> banded LSH
- SimHash: 64-bit sign-aggregated token hashes — fully native exprs
  (explode tokens -> 64 conditional sums; no Python in the hot path)

All shuffle keys are digests (uniform — no skew); small sides broadcast.
At 100 TB the shingle index is the big shuffle: keys are md5 digests so the
hash partitioning is balanced by construction, and frequent-shingle hubs are
capped (`max_bucket`) exactly like LSH implementations cap hot buckets.

The cap itself is skew-safe: over-cap keys are found with a map-side-combined
``groupBy().count()`` and removed via a broadcast anti-join — never with an
unordered Window, which would buffer every row of the hottest key in one task
(the exact straggler/OOM the cap exists to prevent)."""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from .textstats import SPARK_SQL_WS_RUN, WS_RUN, word_ngrams

MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 bands x 4 rows

# observability: connected_components records its last run here —
# {"rounds": int, "fastpath": bool, "edge_counts": [symmetrized distinct
# edges entering each round]} — so tests and BENCH.md can pin how fast a
# graph shape converges without instrumenting Spark
CC_LAST_STATS: dict = {}

# connected_components: once contraction shrinks the quotient graph under
# this many edges, its components are finished with a driver union-find
# instead of further Spark rounds (a few MB of (id, id) rows collect; the
# label TABLE never does). Module-level so tests can pin it (0 disables).
UF_BREAK_MAX = 500_000

# Scoped-cache registry: hot-path operators cache DataFrames that feed
# multiple plan branches (self-join sides, count+anti-join). The registry
# lets a long-lived session release them all once results are materialized
# instead of pinning block-manager memory until LRU eviction. Keyed by the
# owning SparkSession and lock-guarded (ADVICE round-3: a process-global
# list let one pipeline's release_caches() unpersist another concurrently
# running session's live caches — correctness survives via recompute, but
# the perf contract silently breaks).
_CACHE_LOCK = threading.Lock()
# weak keys: a session that ends without calling release_caches must not be
# pinned (with its cached plans) in a module global for process lifetime
_LIVE_CACHES: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def register_cache(df: DataFrame) -> DataFrame:
    """Track a cached DataFrame for later `release_caches()`."""
    with _CACHE_LOCK:
        _LIVE_CACHES.setdefault(df.sparkSession, []).append(df)
    return df


def release_caches(spark=None) -> int:
    """Unpersist registered caches and return how many were released.
    Shared by dedup and similarity. With `spark` given, only that
    session's caches are touched — concurrent pipelines on other sessions
    keep theirs; with no argument every session's are released (the
    single-session CLI/bench shape)."""
    with _CACHE_LOCK:
        if spark is None:
            todo = [df for dfs in _LIVE_CACHES.values() for df in dfs]
            _LIVE_CACHES.clear()
        else:
            todo = _LIVE_CACHES.pop(spark, [])
    n = 0
    for df in todo:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return n


def _cap_hot_keys(df: DataFrame, key_cols: list[str],
                  max_bucket: int) -> DataFrame:
    """Drop all rows whose key appears more than `max_bucket` times.

    Scale-safe plan: `groupBy(keys).count()` combines map-side, so the
    shuffle carries one row per distinct key; the (tiny) over-cap key set is
    broadcast back as a LEFT ANTI join. Equivalent result to filtering on
    `count() OVER (PARTITION BY keys)`, but no single-task buffering of the
    hottest key.

    The input is cached: it feeds the count aggregate, the anti-join probe,
    and (in every caller) both sides of a downstream self-join — without the
    cache the whole upstream hash/explode pipeline would run 3-4x. Callers
    on a cluster too big to cache would swap this for a checkpoint/storage
    round-trip; the plan shape is unchanged. The cache is registered for
    `release_caches()` so sessions running many queries can free it."""
    df = register_cache(df.cache())
    hot = (
        df.groupBy(*key_cols).count()
        .filter(F.col("count") > max_bucket)
        .select(*key_cols)
    )
    return df.join(F.broadcast(hot), key_cols, "left_anti")


def exact_dedup_groups(df: DataFrame, key: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: digest -> canonical (min key) + copy count."""
    return (
        df.select(F.col(_bq(key)), F.md5(F.col(_bq(text_col))).alias("digest"))
        .groupBy("digest")
        .agg(F.min(F.col(_bq(key))).alias("canonical_id"),
             F.count("*").alias("n_copies"))
    )


def _shingles(text_col: str, n: int):
    """n-word shingles as md5 digests — native exprs built via the
    HOF-safe zip_with chain (textstats.word_ngrams): the old
    slice-inside-transform shape re-evaluated the split per ELEMENT
    (O(words^2) per doc — the documented Catalyst projection-collapse
    gotcha)."""
    words = F.split(F.trim(F.col(_bq(text_col))), WS_RUN)
    return F.transform(word_ngrams(words, n), F.md5)


def _shingle_digest_stream_pandas(df: DataFrame, key: str | None,
                                  text_col: str, n: int) -> DataFrame:
    """(key, sh) stream of per-doc DISTINCT n-gram md5 digests — the
    Arrow-batched twin of `explode(array_distinct(_shingles(...)))`
    (r7 optimization): hashlib's C md5 over a plain Python shingle loop
    replaces the interpreted zip_with/transform/array_distinct chain.
    Byte-exact: trim strips 0x20 only, Java split limit=-1 == re.split,
    single-space joins, docs with fewer than n words emit nothing, and
    the per-doc distinct applies to the DIGESTS (exactly what
    array_distinct saw). Pure string ops — pinned equal to the
    expression tier by tests/test_dedup.py."""
    import re  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    ws_re = re.compile(WS_RUN)
    kt = df.schema[key].dataType.simpleString() if key is not None else None

    def run(batches):
        from hashlib import md5  # noqa: PLC0415

        for pdf in batches:
            ks, shs = [], []
            for k_, text in zip(pdf["k"] if kt else pdf.index, pdf["t"]):
                if text is None:
                    continue
                parts = ws_re.split(text.strip(" "))
                if len(parts) < n:
                    continue
                seen = set()
                for i in range(len(parts) - n + 1):
                    d = md5(" ".join(parts[i:i + n]).encode()).hexdigest()
                    if d not in seen:
                        seen.add(d)
                        ks.append(k_)
                        shs.append(d)
            out = {"sh": pd.Series(shs, dtype="object")}
            if kt:
                out = {"k": pd.Series(ks, dtype="object"), **out}
            yield pd.DataFrame(out)

    if key is None:
        return df.select(F.col(_bq(text_col)).alias("t")) \
            .mapInPandas(run, schema="sh string")
    return df.select(F.col(_bq(key)).alias("k"),
                     F.col(_bq(text_col)).alias("t")) \
        .mapInPandas(run, schema=f"k {kt}, sh string")


def shingle_pairs(df: DataFrame, key: str = "doc_id", text_col: str = "text",
                  n: int = 3, min_shared: int = 2,
                  max_bucket: int = 64,
                  engine: str = "auto") -> DataFrame:
    """Candidate near-dup pairs sharing >= min_shared distinct n-gram shingles.

    Inverted index WITHOUT a self-join: after the hot-shingle cap, each
    bucket holds <= max_bucket doc ids, so the pair set is generated
    in-bucket from one `collect_list` (nested array transforms, native) —
    one full shuffle of the shingle stream instead of two join sides, and
    no reliance on caching the stream. The cap (`_cap_hot_keys`) is what
    makes the collect_list safe: bucket size is bounded BEFORE buffering.

    `engine`: "pandas" sources the digest stream from
    `_shingle_digest_stream_pandas` (byte-exact); "sql" keeps the
    native-expression stream. "auto" picks by chain depth: the
    interpreted zip_with chain costs ~(n-1) array passes per doc, so
    the Arrow twin pays off for long shingles (measured at sf1: n=8
    contamination 1.9 -> 1.5 s warm, n=3 parity), while short shingles
    keep the fully-native plan."""
    if engine == "auto":
        engine = "pandas" if n >= 5 else "sql"
    if engine == "pandas":
        ex = _shingle_digest_stream_pandas(df, key, text_col, n)
    elif engine == "sql":
        ex = (
            df.filter(
                F.size(F.split(F.trim(F.col(_bq(text_col))), WS_RUN)) >= n)
            .select(F.col(_bq(key)).alias("k"),
                    F.explode(F.array_distinct(_shingles(text_col, n)))
                    .alias("sh"))
        )
    else:
        raise ValueError(f"unknown shingle engine: {engine!r}")
    capped = _cap_hot_keys(ex, ["sh"], max_bucket)
    buckets = (
        capped.groupBy("sh").agg(F.collect_list("k").alias("ks"))
        .filter(F.size("ks") >= 2)
    )
    pairs = buckets.select(
        F.explode(F.flatten(F.transform(
            F.col("ks"),
            lambda x: F.transform(
                F.filter(F.col("ks"), lambda y: y > x),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        ))).alias("p")
    )
    return (
        pairs.select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def host_quota_sample(docs: DataFrame, host_col: str = "source",
                      key: str = "doc_id",
                      quota: int = 10) -> DataFrame:
    """Per-host quota downsampling (the C4/RefinedWeb host-balancing move:
    a handful of giant hosts dominate a raw crawl, so each host is
    downsampled toward `quota` docs while small hosts pass untouched).
    Each doc is kept with probability min(1, quota/count(host)) via a
    DETERMINISTIC md5-derived uniform — the same doc is kept or dropped
    identically on every run, engine, and partitioning.

    The accept test is EXACT integer math (u32 * host_count <
    quota * 2^32, no float thresholds to drift cross-engine), so the
    DuckDB oracle reproduces the sample bit-for-bit. Safe while
    host_count < 2^31 (u32 * count must fit a BIGINT) — beyond two
    billion docs on ONE host, pre-split the host key. Scale shape: one
    map-side-combined count per host (tiny output), one join of the
    corpus against it (AQE broadcasts the count table when it fits), one
    narrow filter; expected kept size is sum(min(quota, count)) without
    any sort, window, or per-host top-N buffering."""
    cnts = docs.groupBy(_bq(host_col)).agg(F.count("*").alias("_cnt"))
    u = F.conv(F.substring(F.md5(F.col(_bq(key)).cast("string")), 1, 8),
               16, 10).cast("long")
    return (
        docs.join(cnts, host_col)
        .filter(u * F.col("_cnt") < F.lit(quota) * F.lit(1 << 32))
        .drop("_cnt")
    )


def paragraph_dedup(docs: DataFrame, key: str = "doc_id",
                    text_col: str = "text",
                    sep: str = "\n") -> DataFrame:
    """Cross-corpus exact PARAGRAPH dedup (the FineWeb/Gopher boilerplate
    move: repeated nav/footer/legal paragraphs are dropped corpus-wide,
    keeping each distinct paragraph's FIRST occurrence): documents are
    split on `sep`, every occurrence of a duplicated paragraph except the
    one with the smallest (doc, position) survives, and each document's
    text is reassembled in original order. Output: one row per input doc
    with `clean_text`, `n_kept`, `n_dropped`.

    Determinism: the winner per paragraph is a plain MIN aggregate
    (map-side combine, no window/row_number) — over an encoded BIGINT key
    (doc_id * 1e6 + position; positions are bounded by paragraph counts,
    far under 1e6) for integer doc keys, which is what the ANSI oracle
    replays; string keys (urls) take the equivalent min-over-(key, pos)
    struct path. Scale shape: one shuffle keyed on the paragraph digest
    (uniform), one join back on the winner key, one per-doc reassembly
    aggregate; paragraph order is restored with array_sort over
    (pos, text) structs, never a sort of the whole corpus."""
    from pyspark.sql.types import IntegralType  # noqa: PLC0415

    did = F.col(_bq(key))
    # java.util.regex.Pattern.quote semantics: `sep` is a LITERAL
    # separator, but F.split takes a Java regex — an unquoted '.' or '||'
    # would corrupt the splits while array_join reassembles with the
    # literal, and a sep CONTAINING \E would end a naive \Q...\E quote
    # early (review findings; the replace splits and re-quotes embedded
    # \E exactly like Pattern.quote does)
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = docs.select(
        did.alias("k"),
        F.posexplode(F.split(F.col(_bq(text_col)), sep_rx)).alias("pos", "p"),
    )
    integral = isinstance(docs.schema[key].dataType, IntegralType)
    if integral:
        # the encoding is only injective while 0 <= pos < 1e6 and the doc
        # key is non-negative and far from BIGINT overflow — enforce at
        # runtime instead of silently attributing a paragraph to the
        # wrong (doc, pos) on adversarial inputs (review finding)
        bad = (F.col("pos") >= 1_000_000) | (F.col("k") < 0) \
            | (F.col("k") > (1 << 62) // 1_000_000)
        paras = paras.withColumn(
            "ekey",
            F.when(bad, F.raise_error(F.format_string(
                "paragraph_dedup encoded-key bounds exceeded "
                "(key=%s pos=%s): need 0 <= key < 2^62/1e6 and fewer than "
                "1e6 paragraphs per doc — use a string key for the "
                "struct-min path", F.col("k"), F.col("pos"))).cast("long"))
            .otherwise(F.col("k") * F.lit(1_000_000) + F.col("pos")))
        winners = (
            paras.groupBy(F.md5("p").alias("d"))
            .agg(F.min("ekey").alias("ekey"))
            .select("ekey")
        )
        kept = paras.join(winners, "ekey")
    else:
        winners = (
            paras.groupBy(F.md5("p").alias("d"))
            .agg(F.min(F.struct("k", "pos")).alias("w"))
            .select(F.col("w.k").alias("k"), F.col("w.pos").alias("pos"))
        )
        kept = paras.join(winners, ["k", "pos"])
    rebuilt = kept.groupBy("k").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "p"))),
                lambda s: s["p"],
            ), sep).alias("clean_text"),
    )
    n_paras = docs.select(
        did.alias("k"),
        F.size(F.split(F.col(_bq(text_col)), sep_rx)).alias("n_paras"))
    return (
        n_paras.join(rebuilt, "k", "left")
        .select(
            F.col("k").alias(key),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_paras") - F.coalesce("n_kept", F.lit(0)))
            .cast("long").alias("n_dropped"),
        )
    )


def contamination_flags(docs: DataFrame, benchmark: DataFrame,
                        key: str = "doc_id", text_col: str = "text",
                        bench_text_col: str = "text",
                        n: int = 8, min_hits: int = 1) -> DataFrame:
    """Benchmark decontamination — the standard pretraining-data step
    (GPT-3 appendix C / Llama-style n-gram overlap): flag corpus documents
    whose word n-grams intersect an evaluation suite's n-grams, so
    training data can be filtered before a model memorizes its own test
    set. One row per corpus doc: distinct contaminated-shingle count +
    the >= min_hits flag.

    Scale shape: the benchmark side is tiny by construction (eval suites
    are 10^3-10^5 items vs 10^12 docs), so its distinct shingle set is
    BROADCAST and the corpus shingle stream is filtered map-side — the
    only shuffle is the per-doc count aggregate (map-side partial combine
    on the doc key) and the left join back to the doc list. Shingles are
    md5 digests shared with the near-dup family (_shingles), so the
    broadcast carries fixed-width hashes, not raw n-gram strings."""
    # digest streams via the Arrow-batched twin (r7 — byte-exact, see
    # _shingle_digest_stream_pandas); the bench side carries no key and
    # dedups corpus-wide in Spark as before
    doc_sh = _shingle_digest_stream_pandas(docs, key, text_col, n)
    bench_sh = _shingle_digest_stream_pandas(
        benchmark, None, bench_text_col, n).distinct()
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("k").agg(F.count("*").alias("n_contaminated"))
    )
    n_col = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return (
        docs.select(F.col(_bq(key)))
        .join(hits.withColumnRenamed("k", key), key, "left")
        .select(
            F.col(_bq(key)),
            n_col.cast("long").alias("n_contaminated"),
            (n_col >= min_hits).alias("contaminated"),
        )
    )


def substring_dup_stats(docs: DataFrame, key: str = "doc_id",
                        text_col: str = "text",
                        window: int = 64, stride: int = 16,
                        heavy_frac: float = 0.5) -> DataFrame:
    """Exact-substring duplication signals (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" ExactSubstr
    move, re-expressed for a shuffle-based engine): suffix arrays don't
    distribute, but sliding fixed-width character windows at a stride do —
    a substring duplicated across (or within) documents makes every window
    inside it collide, so "how much of this doc is verbatim-duplicated
    text" becomes "what fraction of its windows have a non-unique digest".
    Per doc: `n_windows`, `n_dup_windows` (window text occurs >= 2 times
    corpus-wide, including self-repetition), `dup_window_frac`, and a
    `dup_heavy` drop flag.

    Determinism: windows are char-offset slices (positions 1, 1+stride,
    ... <= len-window+1, 1-based — both engines' substring is 1-based and
    character-counted), digests are md5, and the `dup_heavy` threshold is
    EXACT integer math (n_dup * 10^4 >= round(heavy_frac * 10^4) *
    n_windows) — no float compare to drift cross-engine; the DuckDB
    oracle replays all of it (contract.py q_substring_dedup).

    Scale shape: `n_windows` is a pure LENGTH PROJECTION
    (floor((len-w)/stride)+1 — no shuffle at all), so only the dup side
    touches the window stream: one explode streams ~len/stride windows
    per doc (never a per-doc suffix structure), one md5-keyed groupBy
    counts occurrences (uniform digest keys, map-side partial combine),
    and — the load-bearing reduction — the join-back side is filtered to
    DUPLICATED digests only before the semi join, so in a mostly-unique
    corpus the join's build side is orders of magnitude smaller than a
    count-all-digests table (and AQE can keep broadcasting it far past
    the scale where the full table stopped fitting). The window stream is
    recomputed for the probe side rather than cached (narrow,
    deterministic projection — same discipline as bigram_logprob_score).
    Hot digests (boilerplate repeated millions of times) inflate no
    bucket: the dup set carries ONE row per digest regardless of its
    count."""
    if stride < 1 or window < 1:
        raise ValueError("substring_dup_stats: window/stride must be >= 1")
    did = F.col(_bq(key))
    t = F.col(_bq(text_col))

    def _wins(df_: DataFrame) -> DataFrame:
        return (
            df_.filter(F.length(t) >= window)
            .select(did.alias("k"), t.alias("_t"),
                    F.explode(F.sequence(
                        F.lit(1), F.length(t) - window + 1,
                        F.lit(stride))).alias("pos"))
            .select("k", F.md5(F.expr(
                f"substring(_t, pos, {int(window)})")).alias("d"))
        )

    # ONE window-stream pass shared by both consumers: the per-(doc,
    # digest) count collapses the stream behind a single (k, d) exchange,
    # and the global dup set plus the per-doc dup count both read THAT
    # aggregate — Spark's ReusedExchange makes the explode+md5 pipeline
    # run once instead of twice (r7 optimization; result unchanged:
    # n_dup = sum of a doc's window counts whose digest occurs >= 2
    # times corpus-wide, exactly the old join-then-count semantics).
    wd = _wins(docs).groupBy("k", "d").agg(F.count("*").alias("_c"))
    dups = (wd.groupBy("d").agg(F.sum("_c").alias("_n"))
            .filter(F.col("_n") >= 2).select("d"))
    per_doc = (
        wd.join(dups, "d", "leftsemi")
        .groupBy("k").agg(F.sum("_c").alias("n_dup"))
    )
    thr = int(round(heavy_frac * 10_000))
    nw_proj = F.when(
        F.length(t) >= window,
        (F.floor((F.length(t) - window) / stride) + 1).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    nw = F.col("n_windows")
    nd = F.coalesce(F.col("n_dup"), F.lit(0)).cast("long")
    return (
        docs.select(did.alias("k"), nw_proj.alias("n_windows"))
        .join(per_doc, "k", "left")
        .select(
            F.col("k").alias(key),
            nw.alias("n_windows"),
            nd.alias("n_dup_windows"),
            F.round(nd / F.greatest(nw, F.lit(1)), 4)
             .alias("dup_window_frac"),
            ((nw > 0) & (nd * 10_000 >= F.lit(thr) * nw))
            .alias("dup_heavy"),
        )
    )


def jaccard_pairs(df: DataFrame, pairs: DataFrame, key: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Token-set Jaccard for candidate pairs (ref string-similarity fallback,
    evaluate.py:221-231: intersection/union of token sets)."""
    toks = register_cache(df.select(
        F.col(_bq(key)).alias("k"),
        F.array_distinct(F.split(F.trim(F.col(_bq(text_col))), WS_RUN)).alias("toks"),
    ).cache())  # joined twice (doc_a and doc_b sides); released via release_caches()
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


def _bq(name: str) -> str:
    """Backtick-quote an identifier interpolated into a SQL-string
    expression tree (ADVICE round-3: the JVM-parsed selectExpr formulation
    would otherwise misparse column names with spaces/dots/hyphens that the
    old F.col() form handled)."""
    return "`" + name.replace("`", "``") + "`"


def _perm_hash_sql(p: int, hash_fn: str) -> str:
    """Seeded permutation hash of a shingle digest (SQL-expression string
    over a column named `tok`).

    - "md5": each md5 of "<digest>,<seed_group>" yields FOUR independent
      32-bit permutations (hex slices of the 128-bit digest), so 16 perms
      cost 4 md5 calls per shingle, not 16. Byte-identical in any engine
      with md5 (the DuckDB oracle reproduces it); min is taken over the
      8-hex-char STRING (lexicographic == numeric for fixed-width hex).
    - "xxhash64": Spark-native seeded 64-bit hash — cheapest at scale but
      engine-internal, so not oracle-reproducible."""
    if hash_fn == "md5":
        return (f"substring(md5(concat_ws(',', tok, '{p // 4}')), "
                f"{(p % 4) * 8 + 1}, 8)")
    if hash_fn == "xxhash64":
        return f"xxhash64(tok, {p})"
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def _minhash_signatures_pandas(df: DataFrame, key: str, text_col: str,
                               num_perms: int, shingle_n: int) -> DataFrame:
    """Arrow-batched twin of the md5 SQL tier (r7 optimization): one
    mapInPandas pass computes each doc's permutation mins directly —
    hashlib's C md5 over the shingle stream replaces the interpreted
    zip_with/transform chain AND the explode + 16-min-aggregate shuffle
    (the signature never leaves the row). EXACTLY the SQL tier's bytes:
    trim strips 0x20 only, the split keeps leading/trailing empties
    (Java split limit=-1 == re.split), shingles join on single spaces,
    digests/permutation hashes are md5 hex, mins compare the 8-hex-char
    slices lexicographically (== numeric for fixed-width hex), and docs
    with fewer than shingle_n words emit no row. Pure integer/string
    ops — no float to drift — pinned equal to the SQL tier by
    tests/test_dedup.py::test_minhash_signature_engines_identical."""
    import re  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    # WS_RUN's escapes (\t \n \f \r \x0B) mean the same bytes in Python
    # re as in Java regex, so the pattern is shared verbatim
    ws_re = re.compile(WS_RUN)
    kt = df.schema[key].dataType.simpleString()
    groups = (num_perms + 3) // 4
    slots = [(p // 4, (p % 4) * 8) for p in range(num_perms)]

    def run(batches):
        from hashlib import md5  # noqa: PLC0415

        for pdf in batches:
            ks, sigs = [], []
            for k_, text in zip(pdf["k"], pdf["t"]):
                if text is None:
                    continue
                parts = ws_re.split(text.strip(" "))
                if len(parts) < shingle_n:
                    continue
                mins = [None] * num_perms
                seen = set()
                for i in range(len(parts) - shingle_n + 1):
                    g = " ".join(parts[i:i + shingle_n])
                    if g in seen:
                        continue
                    seen.add(g)
                    d = md5(g.encode()).hexdigest()
                    hs = [md5(f"{d},{gi}".encode()).hexdigest()
                          for gi in range(groups)]
                    for p, (gi, off) in enumerate(slots):
                        s = hs[gi][off:off + 8]
                        if mins[p] is None or s < mins[p]:
                            mins[p] = s
                ks.append(k_)
                sigs.append(mins)
            # object dtype both columns: an all-dropped batch would
            # otherwise default to float64 Series, which Arrow cannot
            # cast to the declared long/array<string> schema
            yield pd.DataFrame({"k": pd.Series(ks, dtype="object"),
                                "signature": pd.Series(sigs,
                                                       dtype="object")})

    out = df.select(F.col(_bq(key)).alias("k"),
                    F.col(_bq(text_col)).alias("t")) \
        .mapInPandas(run, schema=f"k {kt}, signature array<string>")
    return out.withColumnRenamed("k", key)


def minhash_signatures(df: DataFrame, key: str = "doc_id",
                       text_col: str = "text",
                       num_perms: int = MINHASH_PERMS,
                       shingle_n: int = 3,
                       hash_fn: str = "md5",
                       engine: str = "auto") -> DataFrame:
    """MinHash signature per doc: min over n-word shingles of
    perm_hash(shingle, seed_p) for each of `num_perms` seeded permutations —
    all native exprs. Shingles (not unigrams) are the hashed features:
    unigram sets over a small vocabulary are near-identical across documents,
    which would collapse every LSH bucket into one giant skew bucket.

    Plan shape: explode distinct shingles -> one min-aggregate per
    permutation. The per-perm aggregates combine map-side (partial agg), so
    the shuffle carries num_perms values per DOC — a posexplode formulation
    would shuffle num_perms hashed rows per SHINGLE, ~16x the data.

    `engine`: "sql" = the native-expression tier above (the only tier for
    hash_fn="xxhash64" — Python has no exact xxhash64 twin); "pandas" =
    one Arrow-batched pass computing the mins in-row via hashlib's C md5
    (r7: no explode shuffle, no interpreted HOF chain — measured ~2x the
    md5 tier's speed at sf1); "auto" picks pandas for md5. Both tiers are
    byte-identical (string/integer ops only) and test-pinned."""
    if engine == "auto":
        engine = "pandas" if hash_fn == "md5" else "sql"
    if engine == "pandas":
        if hash_fn != "md5":
            raise ValueError("pandas minhash tier requires hash_fn='md5'")
        return _minhash_signatures_pandas(df, key, text_col, num_perms,
                                          shingle_n)
    if engine != "sql":
        raise ValueError(f"unknown minhash engine: {engine!r}")
    toks = df.filter(
        F.size(F.split(F.trim(F.col(_bq(text_col))), WS_RUN)) >= shingle_n
    ).select(
        F.col(_bq(key)).alias("k"),
        F.explode(
            F.array_distinct(_shingles(text_col, shingle_n))
        ).alias("tok"),
    )
    # per-permutation expressions are SQL strings parsed JVM-side: building
    # ~150 Column objects from Python costs ~1 s of py4j round-trips per
    # query (same lesson as simhash_signatures)
    if hash_fn == "md5":
        # one projection computes each seed-group md5 exactly once per
        # shingle row (explicit sharing — no reliance on codegen CSE)
        toks = toks.selectExpr("k", *[
            f"md5(concat_ws(',', tok, '{g}')) AS h{g}"
            for g in range((num_perms + 3) // 4)
        ])
        slot = [f"substring(h{p // 4}, {(p % 4) * 8 + 1}, 8)"
                for p in range(num_perms)]
    else:
        slot = [_perm_hash_sql(p, hash_fn) for p in range(num_perms)]
    mins = toks.groupBy("k").agg(*[
        F.expr(f"min({slot[p]}) AS mh{p}") for p in range(num_perms)
    ])
    return mins.selectExpr(
        f"k AS {_bq(key)}",
        f"array({', '.join(f'mh{p}' for p in range(num_perms))}) AS signature",
    )


def minhash_lsh_pairs(df: DataFrame, key: str = "doc_id",
                      text_col: str = "text", bands: int = LSH_BANDS,
                      num_perms: int = MINHASH_PERMS,
                      min_est_jaccard: float = 0.5,
                      max_bucket: int = 256,
                      hash_fn: str = "md5") -> DataFrame:
    """Banded LSH over MinHash signatures: docs colliding in any band become
    candidate pairs; estimated Jaccard = fraction of matching signature slots.
    Buckets larger than `max_bucket` are dropped before the self-join — the
    skew guard that bounds worst-case pair blowup at scale (groupBy count +
    broadcast anti-join; see `_cap_hot_keys`)."""
    rows = num_perms // bands
    sigs = minhash_signatures(df, key, text_col, num_perms, hash_fn=hash_fn)
    banded = sigs.selectExpr(
        f"{_bq(key)} AS k",
        "signature",
        f"posexplode(transform(sequence(0, {bands - 1}), "
        f"b -> md5(concat_ws(',', transform(slice(signature, b * {rows} + 1, "
        f"{rows}), x -> cast(x AS string)))))) AS (band, bucket)",
    )
    # _cap_hot_keys caches its input, so both self-join sides reuse the
    # banded signature pipeline rather than recomputing it
    banded = _cap_hot_keys(banded, ["band", "bucket"], max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    matches = F.size(F.filter(
        F.zip_with(F.col("a.signature"), F.col("b.signature"),
                   lambda x, y: x == y), lambda v: v
    ))
    # est_jaccard is a pure function of the pair, so filtering BEFORE the
    # dropDuplicates shuffle is equivalent — and the dedup then only carries
    # surviving pairs instead of every band collision
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.k") < F.col("b.k")))
        .select(F.col("a.k").alias("doc_a"), F.col("b.k").alias("doc_b"),
                F.round(matches / F.lit(num_perms), 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_signatures(df: DataFrame, key: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc, fully native (whole-stage codegen end to end).

    Token hash = first 16 hex chars of md5(token) read big-endian (hex char
    1 = bits 63..60 ... char 16 = bits 3..0). Per doc, bit b of the simhash
    is 1 iff the majority of distinct tokens have bit b set (sign of the
    summed +/-1 votes; ties -> 0, matching the classic formulation).

    Plan: explode_outer distinct tokens (outer keeps token-less docs as one
    null row, so they get simhash 0 without a join-back stage) -> two conv()
    ints per token (hex chars 1-15 and 16) -> 64 conditional-sum aggregates
    + a non-null count per doc. The sums combine map-side, so the shuffle
    carries 65 longs per DOC, not per token. Oracle-reproducible: md5 +
    integer bit ops exist verbatim in ANSI-ish SQL (see contract.py).

    The 64-aggregate tree is built as SQL-expression STRINGS parsed JVM-side
    (`F.expr`/`selectExpr`), not Column-by-Column: composing ~800 Column
    objects from Python costs 2-3 s of py4j round-trips per query — measured
    to dominate the whole sf0.1 query (the round-2 bench regression)."""
    toks = df.selectExpr(
        f"{_bq(key)} AS k",
        "explode_outer(filter(array_distinct("
        f"split(trim({_bq(text_col)}), '{SPARK_SQL_WS_RUN}')), x -> x != '')) AS tok",
    )
    # two conv() calls per token, not 16: hex chars 1-15 -> bits 63..4
    # ("hi", < 2^60 so the signed long conv is exact), char 16 -> bits 3..0
    nt = toks.selectExpr("k", "md5(tok) AS h").selectExpr(
        "k",
        "cast(conv(substring(h, 1, 15), 16, 10) AS bigint) AS hi",
        "cast(conv(substring(h, 16, 1), 16, 10) AS bigint) AS lo",
    )

    def bit(b: int) -> str:
        if b < 4:
            return f"shiftright(lo, {b}) & 1"
        return f"shiftright(hi, {b - 4}) & 1"

    agg = nt.groupBy("k").agg(
        F.expr("count(hi) AS cnt"),
        *[F.expr(f"sum({bit(b)}) AS s{b}") for b in range(64)],
    )
    # bit b set iff votes = 2*s_b - cnt > 0; bit 63 is the sign bit
    terms = " + ".join(
        f"(CASE WHEN 2*s{b} > cnt THEN {1 << b}L ELSE 0L END)"
        for b in range(63)
    ) + (" + (CASE WHEN 2*s63 > cnt"
         " THEN -9223372036854775807L - 1L ELSE 0L END)")
    return agg.selectExpr(
        f"k AS {_bq(key)}",
        f"coalesce({terms}, 0L) AS simhash",
    )


def simhash_near_dups(df: DataFrame, key: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 8,
                      max_bucket: int = 1024) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into 4×16-bit keys
    (pigeonhole: hamming<=3 guarantees a shared band; wider max_hamming is
    best-effort as in production SimHash dedup), then verify hamming.
    Buckets larger than `max_bucket` are dropped before the self-join
    (`_cap_hot_keys` — e.g. the simhash-0 bucket of empty docs)."""
    sh = simhash_signatures(df, key, text_col).select(
        F.col(_bq(key)).alias("k"), F.col("simhash").alias("sh"))
    banded = sh.select(
        "k", "sh",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("sh"), 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("band", "bkey"),
    )
    banded = _cap_hot_keys(banded, ["band", "bkey"], max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).cast("int")
    # hamming is a pure function of the pair: filter before the dedup
    # shuffle so it only carries pairs that survive the threshold
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col("a.k") < F.col("b.k")))
        .select(F.col("a.k").alias("doc_a"), F.col("b.k").alias("doc_b"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _union_find_min(rows):
    """Min-root union-find over (a, b) edge rows: returns the parent
    map and the path-compressing find — the driver-side fixpoint both
    the early path and the epilogue of connected_components collect
    into (one implementation so the two stay in sync)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return parent, find


def connected_components(pairs: DataFrame, key_a: str = "doc_a",
                         key_b: str = "doc_b", out_key: str = "doc_id",
                         max_iters: int = 25,
                         pairs_canonical: bool = False) -> DataFrame:
    """Near-duplicate CLUSTERING: connected components over a candidate-pair
    edge list (the step after LSH at corpus scale — pairs say "these two are
    dups", components say "this is one document cluster, keep one copy").

    Hash-min with pointer jumping over a CONTRACTING edge set: every node
    starts labelled with its own id; each round (1) a node's label becomes
    the min over itself and its neighbours, (2) labels are re-pointed
    through the label table itself (comp <- comp[comp], path compression),
    then (3) the edges are CONTRACTED through the fresh labels — each
    endpoint replaced by its component label, self-loops dropped,
    duplicates merged (the round-4 verdict's algorithmic prescription;
    the same quotient-graph move as alternating large-star/small-star).
    Near-dup graphs are near-cliques, so round 1 collapses almost every
    edge to a self-loop: subsequent rounds join a residual edge set
    orders of magnitude smaller instead of ALL edges every round
    (sf0.1 measurement: 112k edges -> 12 after one round). Contracted
    endpoints are labels, which are themselves node ids, so the SAME
    step+jump loop keeps working on the quotient graph while
    contracted-away nodes chase their representatives through the jump.

    Termination: the edge set empty means every remaining dependency is
    resolved — no aggregate-vs-last-round bookkeeping needed; the per-round
    contracted-edge count() doubles as the round's materialization barrier
    (the round-4 label-sum's job, now carrying information that SHRINKS
    work instead of only detecting convergence). Because contracted-away
    nodes may still hold a pointer into a chain (comp(a) = x with
    comp(x) = m), an edge-free graph finishes with jump-only rounds —
    comp <- comp[comp] until every freshly-jumped label is itself a root
    — read off the SAME job as the jump via a third self-join arm, so the
    common one-chain case finishes in a single epilogue round with no
    confirmation pass. Raises if the rounds don't converge rather than
    returning a silently-wrong partial labelling.

    Iterative-plan discipline (the part naive loops get wrong): each round
    references the previous labels ~4-5x, so the LOGICAL plan compounds
    ~5^rounds without a lineage break — labels and edges get a leaf-plan
    reset EVERY round (the per-round count has already materialized their
    caches, so the reset is pure plan surgery over cached data), exactly
    why GraphFrames requires a checkpoint dir for its CC. The reset is a
    driver round-trip while the table is small (`collect_break_max` rows
    of two longs — cheap, and it leaves no checkpoint blocks behind, which
    keeps the loop viable in a 1 GB driver), else `localCheckpoint()`
    (blocks reclaimed by Spark's ContextCleaner once the result is
    dropped). Persisted rounds are released as soon as superseded; the
    final label table is registered for `release_caches()`. Per round: two
    shuffle joins (edges x labels, labels x labels) + one min-aggregate +
    the contraction join, all hash-partitioned on node id (uniform keys —
    upstream pair generators cap hot buckets), with the contraction join
    sized by the SHRINKING edge set.

    The reference has no graph step (single-doc pipeline); this extends the
    LLM-data-pipeline suite (task brief: dedup as first-class). Deterministic
    and oracle-reproducible: the fixpoint (component-min labels) is
    engine-independent, so a DuckDB recursive CTE replicates it exactly
    (contract.py q_neardup_components)."""
    spark = pairs.sparkSession
    collect_break_max = 200_000
    uf_break_max = UF_BREAK_MAX
    uf_edges = None

    def _leaf_reset(df: DataFrame, n_rows: int) -> DataFrame:
        """Replace a DataFrame's plan with a materialized leaf. Driver
        round-trip for small tables (no checkpoint blocks left behind —
        keeps the loop viable in a 1 GB driver), localCheckpoint else."""
        if n_rows <= collect_break_max:
            return spark.createDataFrame(df.collect(), df.schema)
        return df.localCheckpoint(eager=True)

    def _finish(labels: DataFrame, rounds: int, fastpath: bool,
                edge_counts: list) -> DataFrame:
        CC_LAST_STATS.clear()
        CC_LAST_STATS.update(rounds=rounds, fastpath=fastpath,
                             edge_counts=edge_counts)
        if uf_edges is not None:
            CC_LAST_STATS["driver_uf_edges"] = uf_edges
        register_cache(labels)
        return labels.select(F.col("node").alias(out_key),
                             F.col("comp").alias("component_id"))

    e = pairs.select(F.col(key_a).alias("a"), F.col(key_b).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # `pairs_canonical=True` declares the input DISTINCT with key_a < key_b
    # on every row — every LSH pair generator in this package emits exactly
    # that shape — which makes the symmetrized union distinct by
    # construction (the a<b and a>b halves cannot collide), skipping a
    # full shuffle+dedup of 2x the edge list (round-5 verdict #2: this
    # doubled the loop's first shuffle)
    edges0 = (sym if pairs_canonical else sym.distinct()).persist()
    n_edges = edges0.count()
    if 0 < n_edges <= uf_break_max:
        # EARLY DRIVER PATH (r7 optimization): the WHOLE symmetrized edge
        # set already fits the union-find collect bound, so contraction
        # rounds would only shrink a graph that is collectable as-is —
        # each round costs several scheduling-latency-bound jobs (joins,
        # a count, leaf resets) that dwarf the actual work on graphs this
        # small (measured: the ~200-doc curate neardup stage spent ~5 s
        # in round machinery for a few hundred edges). Collect once,
        # close the components on the driver (min id = root — the exact
        # fixpoint the loop converges to), return ONE driver-built label
        # table. Past the bound (true corpus scale) the contraction loop
        # below runs unchanged; UF_BREAK_MAX = 0 disables both driver
        # paths (tests use it to exercise the distributed tail).
        parent, _find0 = _union_find_min(edges0.collect())
        qt = edges0.schema["a"].dataType
        labels = spark.createDataFrame(
            [(x, _find0(x)) for x in list(parent)],
            StructType([StructField("node", qt), StructField("comp", qt)]))
        edges0.unpersist()
        uf_edges = n_edges
        return _finish(labels, 0, False, [n_edges, 0])
    # leaf-reset BEFORE iterating: without it every round's logical plan
    # embeds compounding copies of the whole upstream pair pipeline (the
    # cache shortcuts execution but not plan analysis) — the analysis tree,
    # not the data, is what blows the driver heap
    edges = register_cache(_leaf_reset(edges0, n_edges).cache())
    labels = (edges.select(F.col("a").alias("node")).distinct()
              .withColumn("comp", F.col("node")).persist())
    # the node set never changes, so its size is loop-invariant — computed
    # once for the leaf-reset size guard instead of once per round (this
    # count also materializes the leaf-reset edge cache)
    n_nodes = labels.count()
    edges0.unpersist()
    # LSH near-dup graphs are DENSE (near-cliques): edges outnumber nodes
    # by orders of magnitude (sf1 measurement: 1.9M symmetric edges over
    # 5k nodes). When the label table provably fits a broadcast (we know
    # n_nodes exactly), hint every labels-side join so the big edge list
    # is never shuffled — each round becomes map-side lookups over edges
    # plus tiny aggregates. Past the threshold (true web scale) the joins
    # fall back to hash-partitioned shuffles on uniform node-id keys.
    small = n_nodes <= collect_break_max

    def bcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df
    edge_counts = [n_edges]
    if n_edges == 0:
        return _finish(labels, 0, False, edge_counts)
    prev = labels
    it = 0
    while it < max_iters:
        it += 1
        if it == 1:
            # round 1 labels are the identity (comp == node), so the
            # edges-x-labels join would resolve comp[a] = a — read the
            # neighbour labels straight off the edge list and skip the
            # loop's single biggest shuffle join on its biggest round
            neigh = edges.select(F.col("b").alias("node"),
                                 F.col("a").alias("comp"))
        else:
            neigh = edges.join(bcast(labels),
                               edges["a"] == labels["node"]).select(
                F.col("b").alias("node"), "comp")
        stepped = (
            labels.unionByName(neigh)
            .groupBy("node").agg(F.min("comp").alias("comp"))
        )
        # pointer jump: comp <- stepped[comp] (comp is always a node id, so
        # the self-join is total). Aliases are load-bearing: an unqualified
        # condition on a self-join of a derived frame can resolve both
        # sides to the SAME attribute (Spark self-join ambiguity) and
        # silently turn the jump into a no-op.
        st, jm = stepped.alias("st"), stepped.alias("jm")
        new_labels = st.join(
            bcast(jm), F.col("st.comp") == F.col("jm.node")
        ).select(
            F.col("st.node").alias("node"), F.col("jm.comp").alias("comp")
        ).persist()
        # contract: both endpoints -> their fresh labels; drop resolved
        # (same-label) edges; merge parallel edges. One count() job
        # materializes the contracted edges AND (via the shared cached
        # node) the new labels — the round's single action.
        la, lb = new_labels.alias("la"), new_labels.alias("lb")
        contracted = (
            edges.join(bcast(la), F.col("a") == F.col("la.node"))
            .join(bcast(lb), F.col("b") == F.col("lb.node"))
            .select(F.col("la.comp").alias("a"), F.col("lb.comp").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct().persist()
        )
        n_edges = contracted.count()
        edge_counts.append(n_edges)
        edges.unpersist()
        if prev is not None:
            prev.unpersist()
        # leaf-reset BOTH tables every round: the count above already
        # materialized their caches, so the small-table reset is a driver
        # round-trip over cached blocks (no recompute) and the big-table
        # reset is one localCheckpoint pass. The contraction join
        # references the fresh labels twice and the labels join references
        # the previous round ~4x, so without per-round resets the logical
        # plan compounds ~5^rounds — the analysis tree, not the data,
        # OOMs the driver (GraphFrames checkpoints its CC every other
        # round for exactly this reason).
        broken_l = _leaf_reset(new_labels, n_nodes)
        new_labels.unpersist()
        new_labels = broken_l.persist() \
            if n_nodes <= collect_break_max else broken_l
        if 0 < n_edges <= uf_break_max:
            # DRIVER EPILOGUE (round-6): once contraction has shrunk the
            # quotient graph under the collect bound, spinning more Spark
            # rounds is pure overhead — each costs joins, a count job and
            # leaf resets to move a few hundred thousand longs. Collect
            # the residual edges (<= uf_break_max rows of two ids, a few
            # MB), finish the quotient components with a driver
            # union-find (min id = root, exactly the fixpoint the loop
            # converges to), and fold the root map back over the label
            # table with ONE broadcast left join. Earlier-round pointer
            # chains are untouched — the jump epilogue below still
            # resolves them — but every residual-edge dependency is now
            # closed, so this replaces an unbounded tail of contraction
            # rounds with one narrow job. sf1 measurement: the 211k-edge
            # quotient after round 1 took 2 more contraction rounds +
            # epilogue (~8 s); the union-find path closes it in <1 s.
            parent, _find = _union_find_min(contracted.collect())
            mapping = [(q, _find(q)) for q in list(parent)]
            mapping = [(q, r) for q, r in mapping if q != r]
            contracted.unpersist()
            qt = contracted.schema["a"].dataType
            mdf = spark.createDataFrame(
                mapping,
                StructType([StructField("_q", qt), StructField("_r", qt)]))
            lab = new_labels.alias("lab")
            relabeled = lab.join(
                F.broadcast(mdf), F.col("lab.comp") == F.col("_q"), "left"
            ).select(
                F.col("lab.node").alias("node"),
                F.coalesce(F.col("_r"), F.col("lab.comp")).alias("comp"),
            )
            # materialize the relabel, then drop the pre-relabel cache —
            # leaving it persisted leaks the block past release_caches()
            broken_r = _leaf_reset(relabeled, n_nodes)
            new_labels.unpersist()
            new_labels = broken_r.persist() \
                if n_nodes <= collect_break_max else broken_r
            uf_edges = n_edges
            edge_counts.append(0)
            prev = labels = new_labels
            edges = None
            break
        if n_edges > 0:
            broken_e = _leaf_reset(contracted, n_edges)
            contracted.unpersist()
            contracted = broken_e.persist() \
                if n_edges <= collect_break_max else broken_e
        else:
            contracted.unpersist()  # empty: never joined again
        prev = labels = new_labels
        edges = contracted
        if n_edges == 0:
            if it == 1:
                # the ROUND-1 contraction runs over the original edges, so
                # empty means every original edge already has equal
                # endpoint labels: per component the labelling is uniform,
                # and (labels being monotone node ids with the min keeping
                # itself) that uniform value IS the component min — the
                # fixpoint, provably, with no pointer chains to resolve.
                # Near-clique LSH graphs land here, skipping the jump
                # epilogue's two confirmation jobs entirely.
                return _finish(labels, it, True, edge_counts)
            break
    else:
        # release_caches() frees both after the raise
        register_cache(labels)
        register_cache(edges)
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(pathological component diameter — raise max_iters)")

    # jump-only epilogue: contracted-away nodes may still point into a
    # label chain; double the pointers until no label moves. Stability is
    # read off the SAME job as the jump — the join carries the old comp
    # alongside the new one and a moved-count aggregate runs on the
    # freshly persisted result, so a chain-free graph confirms in ONE
    # epilogue round (the round-4 two-consecutive-sums scheme always paid
    # a second confirmation round). The budget is INDEPENDENT of the
    # contraction loop's (review finding: sharing max_iters made a graph
    # that contracted empty on the last allowed round raise spuriously at
    # the fixpoint) — chains are at most `it` long and jumping doubles,
    # so log2(it)+2 rounds always suffice; max_iters stays the user dial.
    ep_budget = max(max_iters, it.bit_length() + 2)
    ep = 0
    while ep < ep_budget:
        ep += 1
        it += 1
        # three arms of ONE self-join: st (node -> old comp), jm (the
        # jump target), jm2 (the target's own comp). `unstable` asks
        # whether the NEW label is already a root — if every node's new
        # comp is a root, the next jump would be the identity, so THIS
        # round's labels are the fixpoint and no confirmation round is
        # needed (the moved-vs-last-round schemes always paid one).
        st, jm, jm2 = (labels.alias("st"), labels.alias("jm"),
                       labels.alias("jm2"))
        jumped = st.join(
            bcast(jm), F.col("st.comp") == F.col("jm.node")
        ).join(
            bcast(jm2), F.col("jm.comp") == F.col("jm2.node")
        ).select(
            F.col("st.node").alias("node"), F.col("jm.comp").alias("comp"),
            (F.col("jm2.comp") != F.col("jm.comp")).cast("long")
            .alias("unstable"),
        ).persist()
        n_unstable = jumped.agg(
            F.sum("unstable").alias("u")).first().u or 0
        labels.unpersist()
        broken = _leaf_reset(jumped.drop("unstable"), n_nodes)  # plan cut
        jumped.unpersist()
        labels = broken.persist() if n_nodes <= collect_break_max else broken
        if n_unstable == 0:
            return _finish(labels, it, False, edge_counts)
    register_cache(labels)
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(pathological component diameter — raise max_iters)")


def keep_canonical(df: DataFrame, components: DataFrame,
                   key: str = "doc_id") -> DataFrame:
    """Corpus keep-one filter: drop every clustered document except its
    component's canonical (smallest-id) member; documents in no component
    pass through untouched. `components` is connected_components output."""
    losers = components.filter(
        F.col(_bq(key)) != F.col("component_id")).select(F.col(_bq(key)))
    return df.join(losers, key, "left_anti")


def dedup_against(docs: DataFrame, seen: DataFrame, key: str = "doc_id",
                  text_col: str = "text",
                  seen_digest_col: str = "digest") -> DataFrame:
    """Incremental cross-snapshot exact dedup (the move every rolling
    crawl pipeline runs: dedupe THIS dump against every dump already
    ingested): flag each doc as novel iff its text md5 digest is absent
    from `seen`, the digest set of previously-ingested corpus snapshots
    (e.g. the `digest` column of a committed exact_dedup_groups table, or
    a prior run's dedup_against output). Returns (key, digest,
    is_novel) — the digest column is the row to fold back into the seen
    set for the NEXT snapshot.

    Scale shape: the doc digest is a narrow projection (no corpus
    shuffle before the join); `seen` is distinct-ed on the digest (one
    uniform-key shuffle of the — much smaller — history digest table,
    which also makes the left join multiplicity-safe if a caller feeds
    an undeduplicated history) and joined on uniform md5 keys, so AQE
    broadcasts it while it fits and degrades to a co-partitioned
    shuffle join beyond that. No window, no sort, no driver state."""
    d = docs.select(F.col(_bq(key)),
                    F.md5(F.col(_bq(text_col))).alias("digest"))
    s = (seen.select(F.col(_bq(seen_digest_col)).alias("digest"))
         .distinct().withColumn("_seen", F.lit(1)))
    return (
        d.join(s, "digest", "left")
        .select(F.col(_bq(key)), "digest",
                F.col("_seen").isNull().alias("is_novel"))
    )


def url_blocklist_flags(docs: DataFrame, blocked_domains,
                        key: str = "doc_id",
                        url_col: str = "url") -> DataFrame:
    """UT1/C4-style domain blocklist filter: a doc is blocked iff its URL
    host, or ANY dot-suffix of it, appears in the blocklist — registrable-
    domain semantics without a PSL dependency (blocking 'example.com'
    blocks 'a.b.example.com'; blocking 'b.example.com' does not block
    'example.com'). Returns (key, host, blocked, blocked_domain) where
    blocked_domain is the alphabetically-first matching entry — a
    deterministic, auditable provenance tag.

    `blocked_domains`: a DataFrame with a `domain` string column, or any
    iterable of strings (config-scale lists). Entries are lowercased.

    Scale shape: the host is a narrow regexp projection; each host
    explodes into at most its dot-label count of suffixes (bounded ~10,
    never corpus-scale fan-out); the blocklist joins broadcast (even a
    UT1-scale list of millions of domains is tens of MB); the only
    corpus shuffle is the per-doc min aggregate on uniform keys."""
    if not isinstance(blocked_domains, DataFrame):
        doms = sorted({str(x).lower() for x in blocked_domains})
        if not doms:
            raise ValueError("url_blocklist_flags: empty blocklist")
        bl = docs.sparkSession.createDataFrame([(x,) for x in doms],
                                               "domain string")
    else:
        bl = blocked_domains.select(
            F.lower(F.col("domain")).alias("domain"))
    host = F.lower(F.regexp_extract(
        F.col(_bq(url_col)), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*)", 1))
    base = docs.select(F.col(_bq(key)).alias("k"), host.alias("host"))
    parts = F.split(F.col("host"), r"\.")
    sufs = F.transform(
        F.sequence(F.lit(0), F.size(parts) - 1),
        lambda i: F.array_join(
            F.slice(parts, i + 1, F.size(parts) - i), "."))
    m = (
        base.select("k", F.explode(sufs).alias("domain"))
        .join(F.broadcast(bl), "domain")
        .groupBy("k").agg(F.min("domain").alias("blocked_domain"))
    )
    return (
        base.join(m, "k", "left")
        .select(F.col("k").alias(key), "host",
                F.col("blocked_domain").isNotNull().alias("blocked"),
                "blocked_domain")
    )
