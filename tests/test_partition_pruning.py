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
    assert all(snap["partitions"][f] == {"lang": "en"} for f in en_files)


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
    removed = cat.vacuum("docs")
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
