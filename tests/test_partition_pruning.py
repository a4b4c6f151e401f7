"""Manifest-level partition pruning — the Iceberg move the snapshot layer
gained in round 3: a reader with a partition predicate never opens
non-matching files; row-level exactness comes from the residual filter."""

import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources.tables import (
    Catalog,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(str(tmp_path))
    df = spark.createDataFrame(
        [(i, ["en", "hi", "zh"][i % 3], f"text {i}") for i in range(90)],
        "doc_id long, lang string, text string")
    c.append("docs", df.repartition(4), partition_by=["lang"])
    return c


def test_pruned_read_matches_full_filter(spark, cat):
    full = {r.doc_id for r in cat.read(spark, "docs").collect()
            if r.lang == "en"}
    pruned = cat.read(spark, "docs", where={"lang": "en"})
    assert {r.doc_id for r in pruned.collect()} == full
    assert set(pruned.columns) == {"doc_id", "lang", "text"}  # no shadow cols


def test_manifest_prunes_file_set(spark, cat):
    all_files = cat.scan_files("docs")
    en_files = cat.scan_files("docs", where={"lang": "en"})
    assert 0 < len(en_files) < len(all_files)
    # every surviving file is recorded as an en-partition file
    snap = cat._read_current("docs")
    recorded = {r["path"]: r.get("partition")
                for e in snap["manifests"] for r in cat._read_manifest(e)}
    assert all(recorded[f] == {"lang": "en"} for f in en_files)


def test_mixed_partitioned_and_plain_appends(spark, cat):
    extra = spark.createDataFrame(
        [(1000, "en", "late unpartitioned row")],
        "doc_id long, lang string, text string")
    cat.append("docs", extra)  # no partition_by: file has no partition info
    # unpartitioned files are conservatively kept under any predicate...
    en = cat.read(spark, "docs", where={"lang": "en"}).collect()
    assert 1000 in {r.doc_id for r in en}
    # ...and the residual filter still drops non-matching rows from them
    hi = cat.read(spark, "docs", where={"lang": "hi"}).collect()
    assert 1000 not in {r.doc_id for r in hi}


def test_vacuum_keeps_live_partitioned_files(spark, cat, tmp_path):
    # expire the first partitioned snapshot by overwriting, then vacuum:
    # live (current) partitioned files must survive the recursive GC walk
    sub = cat.read(spark, "docs", where={"lang": "zh"})
    cat.overwrite("docs", sub, partition_by=["lang"])
    removed = cat.vacuum("docs", min_age_secs=0)
    assert removed > 0
    got = cat.read(spark, "docs").collect()
    assert {r.lang for r in got} == {"zh"}
    assert len(got) == 30


def test_escaped_partition_values_round_trip(spark, tmp_path):
    """Spark hive-escapes dir values (':' -> '%3A'); the manifest must
    record the UNESCAPED value or predicates silently prune matching
    files (review finding — silent row loss)."""
    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00"), (2, "2024-01-02 08:30:00")],
        "doc_id long, day string")
    cat.append("t", df, partition_by=["day"])
    got = cat.read(spark, "t", where={"day": "2024-01-01 12:00:00"}).collect()
    assert [r.doc_id for r in got] == [1]
    assert len(cat.scan_files("t", where={"day": "2024-01-01 12:00:00"})) >= 1


def test_non_string_predicate_values_coerce(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame([(1, 2024), (2, 2025)],
                               "doc_id long, year int")
    cat.append("t", df, partition_by=["year"])
    got = cat.read(spark, "t", where={"year": 2024}).collect()
    assert [r.doc_id for r in got] == [1]


def test_fully_pruned_read_returns_empty_frame(spark, cat):
    got = cat.read(spark, "docs", where={"lang": "fr"})
    assert got.count() == 0
    assert set(got.columns) == {"doc_id", "lang", "text"}


def test_rollback_preserves_partition_metadata(spark, tmp_path):
    """remove_orphan_appends' rollback commit must carry forward the
    surviving files' partition values, or pruning silently dies."""
    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame(
        [(i, ["en", "hi"][i % 2]) for i in range(20)],
        "doc_id long, lang string")
    cat.append("t", df, partition_by=["lang"], txn="good")
    cat.append("t", spark.createDataFrame([(99, "zz")],
               "doc_id long, lang string"), partition_by=["lang"], txn="dead")
    cat.remove_orphan_appends("t", live_txns={"good"})
    pruned = cat.scan_files("t", where={"lang": "en"})
    assert 0 < len(pruned) < len(cat.scan_files("t"))


def test_range_and_in_predicates(spark, tmp_path):
    """Round-4 predicate forms: range / IN / between prune at the manifest
    level and filter residually, string-ordered (zero-padded dates)."""
    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame(
        [(i, f"2025-01-{i % 9 + 1:02d}") for i in range(45)],
        "doc_id long, day string")
    cat.append("t", df.repartition(3), partition_by=["day"])

    def ids(where):
        return sorted(r.doc_id for r in
                      cat.read(spark, "t", where=where).collect())

    exp_ge = sorted(i for i in range(45) if i % 9 + 1 >= 7)
    assert ids({"day": (">=", "2025-01-07")}) == exp_ge
    exp_in = sorted(i for i in range(45) if i % 9 + 1 in (2, 5))
    assert ids({"day": ("in", ["2025-01-02", "2025-01-05"])}) == exp_in
    exp_bt = sorted(i for i in range(45) if 3 <= i % 9 + 1 <= 4)
    assert ids({"day": ("between", "2025-01-03", "2025-01-04")}) == exp_bt
    # range prune really shrinks the file set
    assert len(cat.scan_files("t", where={"day": ("<", "2025-01-02")})) \
        < len(cat.scan_files("t"))


def test_bool_predicate_coerces_to_spark_form(spark, tmp_path):
    """ADVICE regression: where={'flag': True} must match Spark's 'true'
    dir value, not Python's 'True' (silent empty result)."""
    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame([(1, True), (2, False)],
                               "doc_id long, flag boolean")
    cat.append("t", df, partition_by=["flag"])
    assert [r.doc_id for r in
            cat.read(spark, "t", where={"flag": True}).collect()] == [1]
    with pytest.raises(TypeError, match="float"):
        cat.scan_files("t", where={"flag": 1.5})


def test_manifest_level_prune_skips_opening_manifests(spark, tmp_path):
    """The manifest-LIST value summary must rule out whole manifests
    WITHOUT opening them (the Iceberg two-stage scan)."""
    cat = Catalog(str(tmp_path))
    for lang in ("en", "hi", "zh"):
        df = spark.createDataFrame([(i, lang) for i in range(6)],
                                   "doc_id long, lang string")
        cat.append("t", df.coalesce(2), partition_by=["lang"])
    cat.scan_files("t", where={"lang": "en"})
    st = cat.last_scan_stats
    assert st["manifests_total"] == 3
    assert st["manifests_opened"] == 1  # hi/zh manifests never opened
    assert st["files_selected"] >= 1


def test_metadata_bytes_per_append_stay_flat(spark, tmp_path):
    """The round-4 point: append metadata cost is O(new files), NOT
    O(table files). 100 appends; the metadata bytes written by late
    appends must not exceed ~the early ones (small-manifest merging
    bounds the manifest list; merge commits themselves amortize)."""
    import os

    cat = Catalog(str(tmp_path))
    meta = os.path.join(str(tmp_path), "t", "_meta")

    def meta_bytes():
        return sum(os.path.getsize(os.path.join(meta, f))
                   for f in os.listdir(meta)) if os.path.isdir(meta) else 0

    df = spark.range(2).coalesce(1)
    costs = []
    before = meta_bytes()
    for _ in range(100):
        cat.append("t", df)
        after = meta_bytes()
        costs.append(after - before)
        before = after
    early = sorted(costs[2:20])[len(costs[2:20]) // 2]
    late = sorted(costs[80:])[len(costs[80:]) // 2]
    assert late <= 3 * early, (early, late, costs[-10:])
    # and the table still reads correctly
    assert cat.read(spark, "t").count() == 200
    # vacuum GCs the pre-merge manifest files the merged ones replaced
    cat.vacuum("t", min_age_secs=0)
    live = {os.path.basename(e["manifest"])
            for e in cat._read_current("t")["manifests"]}
    on_disk = {f for f in os.listdir(meta) if f.startswith("m-")}
    assert on_disk == live


def test_rollback_of_merged_mixed_txn_manifest(spark, tmp_path):
    """After small-manifest merging, one manifest can hold files from BOTH
    live and dead txns; remove_orphan_appends must rewrite it, dropping
    only the dead files."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources import tables as T

    cat = Catalog(str(tmp_path))
    df = spark.range(3).coalesce(1)
    for i in range(T.MERGE_MIN - 1):
        cat.append("t", df, txn=f"live-{i}")
    cat.append("t", df, txn="dead-1")  # triggers the merge
    assert len(cat._read_current("t")["manifests"]) == 1  # merged
    removed = cat.remove_orphan_appends(
        "t", live_txns={f"live-{i}" for i in range(T.MERGE_MIN - 1)})
    assert removed == 1
    assert cat.read(spark, "t").count() == 3 * (T.MERGE_MIN - 1)


def test_partitioned_vacuum_cleans_crc_and_empty_dirs(spark, tmp_path):
    """ADVICE regression: vacuum over a PARTITIONED append whose files
    partially expire must remove crc sidecars and emptied _p_* dirs."""
    import os

    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame(
        [(i, ["en", "hi"][i % 2]) for i in range(20)],
        "doc_id long, lang string")
    cat.append("t", df, partition_by=["lang"])
    # drop the hi partition by overwriting with en only; the en files of the
    # first staging dir expire but the staging dir itself had both
    cat.overwrite("t", cat.read(spark, "t", where={"lang": "en"}),
                  partition_by=["lang"])
    removed = cat.vacuum("t", min_age_secs=0)
    assert removed > 0
    data_root = os.path.join(str(tmp_path), "t", "data")
    for root, dirs, fs in os.walk(data_root):
        for f in fs:
            if f.endswith(".crc") and f != "._SUCCESS.crc":
                assert os.path.exists(os.path.join(root, f[1:-4])), \
                    f"orphan crc {os.path.join(root, f)}"
        if root != data_root and os.path.basename(root).startswith("_p_"):
            assert os.listdir(root), f"empty partition dir {root}"
    assert {r.lang for r in cat.read(spark, "t").collect()} == {"en"}


def test_pipeline_writes_day_partitioned_results(spark, tmp_path):
    """Prescription: the extraction pipeline CONSUMES pruning — results land
    partitioned by warc_day and a day-slice read opens a strictly smaller
    file set while matching the full-scan filter row-for-row."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark import datagen
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.plans import lineage

    # 144 docs spread over 3 crawl days (warc_ts = EPOCH + doc_id minutes)
    docs = spark.createDataFrame(
        [(i * 30, f"day spread doc {i} " + "word " * 40, "en")
         for i in range(144)],
        "doc_id long, text string, lang string")
    pages = datagen.pages_from_documents(docs)
    cat = Catalog(str(tmp_path))
    lineage.run_extraction(spark, pages, cat, "run-days", num_partitions=8)

    all_files = cat.scan_files(lineage.RESULTS_TABLE)
    day1 = cat.scan_files(lineage.RESULTS_TABLE,
                          where={"warc_day": "2025-01-01"})
    assert 0 < len(day1) < len(all_files)

    full = cat.read(spark, lineage.RESULTS_TABLE)
    expect = {r.url for r in full.collect() if r.warc_day == "2025-01-01"}
    pruned = cat.read(spark, lineage.RESULTS_TABLE,
                      where={"warc_day": "2025-01-01"})
    assert {r.url for r in pruned.collect()} == expect
    # lineage is partitioned by run_id too
    assert cat.scan_files(
        lineage.LINEAGE_TABLE, where={"run_id": "run-days"})


def test_empty_string_partition_values_not_lost(spark, tmp_path):
    """Review regression: rows with '' partition values land in the hive
    null-sentinel dir; equality/range predicates that '' satisfies must
    keep those files so the residual filter can match the rows."""
    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame([(1, ""), (2, "en"), (3, None)],
                               "doc_id long, lang string")
    cat.append("t", df, partition_by=["lang"])
    got = cat.read(spark, "t", where={"lang": ""}).collect()
    assert {r.doc_id for r in got} == {1}  # exact: '' only, not null
    got_null = cat.read(spark, "t", where={"lang": None}).collect()
    assert {r.doc_id for r in got_null} == {3}  # exact: null only
    got_ge = cat.read(spark, "t", where={"lang": ("<=", "en")}).collect()
    assert {r.doc_id for r in got_ge} == {1, 2}  # '' <= 'en'; null drops
    got_in = cat.read(spark, "t", where={"lang": ("in", ["", "en"])})
    assert {r.doc_id for r in got_in.collect()} == {1, 2}


def test_rollback_keeps_untagged_rows_in_merged_manifest(spark, tmp_path):
    """Review regression: a merged manifest whose NAMED txns are all dead
    can still hold untagged (txn=None) rows — rollback must rewrite, not
    drop, the manifest."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources import tables as T

    cat = Catalog(str(tmp_path))
    df = spark.range(2).coalesce(1)
    cat.append("t", df)  # untagged
    for i in range(T.MERGE_MIN - 1):
        cat.append("t", df, txn="dead")
    assert len(cat._read_current("t")["manifests"]) == 1  # merged
    removed = cat.remove_orphan_appends("t", live_txns=set())
    assert removed == T.MERGE_MIN - 1
    assert cat.read(spark, "t").count() == 2  # the untagged rows survive


def test_reads_pre_manifest_list_snapshots(spark, tmp_path):
    """Review regression: catalogs written by the round-3 layout (full
    "files" list in the snapshot) must stay readable — upgraded in memory
    to one synthetic manifest entry; the next commit writes the new
    layout."""
    import json
    import os

    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame(
        [(i, ["en", "hi"][i % 2]) for i in range(10)],
        "doc_id long, lang string")
    cat.append("t", df, partition_by=["lang"])
    # rewrite the snapshot in the OLD layout
    snap = cat._read_current("t")
    files, parts = [], {}
    for e in snap["manifests"]:
        for r in cat._read_manifest(e):
            files.append(r["path"])
            if r.get("partition"):
                parts[r["path"]] = r["partition"]
    old = {"version": 1, "parent": None, "operation": "append",
           "files": sorted(files), "added": sorted(files), "txn": "legacy",
           "partitions": parts, "committed_at": 0.0}
    meta = os.path.join(str(tmp_path), "t", "_meta")
    for fn in os.listdir(meta):
        if fn.startswith(("v", "m-")):
            os.remove(os.path.join(meta, fn))
    with open(os.path.join(meta, "v1.json"), "w") as f:
        json.dump(old, f)
    with open(os.path.join(meta, "_current"), "w") as f:
        f.write("1")

    assert cat.read(spark, "t").count() == 10
    en = cat.scan_files("t", where={"lang": "en"})
    assert 0 < len(en) < len(cat.scan_files("t"))
    # appends on top of a legacy snapshot write the new layout and keep data
    cat.append("t", df.limit(2))
    assert cat.read(spark, "t").count() == 12
    assert "manifests" in cat._read_current("t")


def test_predicate_semantics_property(spark, tmp_path):
    """Property check: for a table whose partition values include the nasty
    cases (None, '', hive-escaped chars, unicode, digits), EVERY predicate
    form must return exactly the rows the documented string-cast semantics
    predict — pruning can only change which files open, never the rows."""
    vals = [None, "", "en", "hi", "zh-Hant", "2024-01-01 12:00:00",
            "a:b", "0", "10", "9", "日本語", "x y"]
    rows = [(i, v) for i, v in enumerate(vals)] + \
           [(100 + i, v) for i, v in enumerate(vals)]
    cat = Catalog(str(tmp_path))
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    cat.append("t", df.repartition(3), partition_by=["lang"])

    def expect(pred_fn):
        return {i for i, v in rows if v is not None and pred_fn(v)}

    cases = [
        ({"lang": "en"}, expect(lambda v: v == "en")),
        ({"lang": ""}, expect(lambda v: v == "")),
        ({"lang": None}, {i for i, v in rows if v is None}),
        ({"lang": "a:b"}, expect(lambda v: v == "a:b")),
        ({"lang": "日本語"}, expect(lambda v: v == "日本語")),
        ({"lang": "x y"}, expect(lambda v: v == "x y")),
        ({"lang": ("in", ["en", None, "10"])},
         expect(lambda v: v in ("en", "10"))
         | {i for i, v in rows if v is None}),
        ({"lang": (">=", "en")}, expect(lambda v: v >= "en")),
        ({"lang": ("<", "en")}, expect(lambda v: v < "en")),
        ({"lang": ("<=", "")}, expect(lambda v: v <= "")),
        ({"lang": ("between", "0", "9")},
         expect(lambda v: "0" <= v <= "9")),  # lexicographic: '10' matches
        ({"lang": ("in", [""])}, expect(lambda v: v == "")),
        ({"lang": (">", "zh-Hant")}, expect(lambda v: v > "zh-Hant")),
    ]
    for where, want in cases:
        got = {r.doc_id for r in cat.read(spark, "t", where=where).collect()}
        assert got == want, (where, sorted(got), sorted(want))
