"""Iceberg-style table layer: atomic commits, snapshot history, and
idempotent checkpointed resume (SURVEY §5.2.5)."""

import pytest
from pyspark.sql import functions as F

from _intelligent_document_ai_for_field_extraction_from_invoices_spark import datagen
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.plans import lineage
from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources.tables import Catalog


def test_catalog_overwrite_append_read(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    v1 = cat.overwrite("t", df)
    assert cat.read(spark, "t").count() == 10
    v2 = cat.append("t", spark.range(5).withColumn("v", F.col("id")))
    assert v2 == v1 + 1
    assert cat.read(spark, "t").count() == 15
    # time travel to the first snapshot
    assert cat.read(spark, "t", version=v1).count() == 10
    ops = [s["operation"] for s in cat.snapshots("t")]
    assert ops == ["overwrite", "append"]


def test_overwrite_replaces_idempotently(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    cat.overwrite("t", spark.range(10))
    cat.overwrite("t", spark.range(3))
    assert cat.read(spark, "t").count() == 3


@pytest.fixture()
def pages(spark, documents):
    return datagen.pages_from_documents(documents)


def test_resume_after_partial_run(spark, pages, tmp_path):
    """Kill after a partition subset committed -> rerun -> identical final
    table, no duplicate rows (idempotence — north rule)."""
    run_full = Catalog(str(tmp_path / "full"))
    lineage.run_extraction(spark, pages, run_full, "run-a", num_partitions=8)
    full = {r.url: r.body_text for r in
            run_full.read(spark, lineage.RESULTS_TABLE).collect()}

    cat = Catalog(str(tmp_path / "resumed"))
    s1 = lineage.run_extraction(spark, pages, cat, "run-1", num_partitions=8,
                                fail_after_parts=3)  # simulated crash
    assert s1["parts_done"] == 3
    s2 = lineage.run_extraction(spark, pages, cat, "run-2", num_partitions=8)
    assert s2["parts_skipped"] == 3
    assert s2["parts_done"] == 5
    got = {r.url: r.body_text for r in
           cat.read(spark, lineage.RESULTS_TABLE).collect()}
    assert got == full  # byte-identical, no dups, nothing missing

    # a third run is a no-op
    s3 = lineage.run_extraction(spark, pages, cat, "run-3", num_partitions=8)
    assert s3 == {"parts_done": 0, "parts_skipped": 8, "rows_written": 0}

    # lineage covers every partition exactly once
    lin = cat.read(spark, lineage.LINEAGE_TABLE)
    parts = [r.part_id for r in lin.select("part_id").collect()]
    assert sorted(parts) == sorted(set(parts))
    assert len(parts) == 8
    assert lin.agg(F.sum("n_rows")).first()[0] == len(full)


def test_pages_through_catalog_roundtrip(spark, pages, tmp_path):
    """The production shape: pages land in the Iceberg-style table first,
    extraction reads the committed snapshot (S1/S6)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators.extract import (
        extract_pages,
    )

    cat = Catalog(str(tmp_path))
    cat.overwrite("pages", pages)
    stored = cat.read(spark, "pages")
    assert stored.count() == pages.count()
    res = extract_pages(stored, num_partitions=4)
    assert res.filter("status = 'success'").count() > 0


def test_lineage_metrics_shape(spark, pages, tmp_path):
    cat = Catalog(str(tmp_path))
    lineage.run_extraction(spark, pages, cat, "r", num_partitions=4)
    lin = cat.read(spark, lineage.LINEAGE_TABLE)
    assert set(lin.columns) >= {"run_id", "part_id", "n_rows", "bytes_in",
                                "bytes_out", "blocks_kept", "blocks_dropped",
                                "parse_failures", "n_failed", "committed_at"}
    assert lin.agg(F.sum("bytes_in")).first()[0] > 0
    agg = lin.agg(F.sum("blocks_kept"), F.sum("n_failed")).first()
    assert agg[0] > 0 and agg[1] > 0  # empty-flavor pages land as failed rows


def test_resume_after_torn_transaction(spark, pages, tmp_path):
    """ADVICE regression: crash BETWEEN the results append and the checkpoint
    commit must not duplicate rows on resume — the orphaned results/lineage
    appends are rolled back (metadata-only) before the rerun re-extracts."""
    run_full = Catalog(str(tmp_path / "full"))
    lineage.run_extraction(spark, pages, run_full, "run-a", num_partitions=8)
    full = {r.url: r.body_text for r in
            run_full.read(spark, lineage.RESULTS_TABLE).collect()}

    cat = Catalog(str(tmp_path / "torn"))
    # first: 3 partitions commit cleanly
    lineage.run_extraction(spark, pages, cat, "run-1", num_partitions=8,
                           fail_after_parts=3)
    # second: results+lineage appended for the remaining 5 parts, then crash
    with pytest.raises(RuntimeError, match="simulated crash"):
        lineage.run_extraction(spark, pages, cat, "run-2", num_partitions=8,
                               fail_before_checkpoint=True)
    # torn state: all 8 parts' rows present but only 3 parts checkpointed —
    # a naive resume would re-extract 5 parts and duplicate their rows
    assert cat.read(spark, lineage.RESULTS_TABLE).count() == len(full)

    # resume: must roll back the orphans, re-extract the 5 parts, no dups
    s3 = lineage.run_extraction(spark, pages, cat, "run-3", num_partitions=8)
    assert s3["parts_skipped"] == 3
    assert s3["parts_done"] == 5
    got = [r for r in cat.read(spark, lineage.RESULTS_TABLE).collect()]
    by_url = {}
    for r in got:
        assert r.url not in by_url, f"duplicate row for {r.url}"
        by_url[r.url] = r.body_text
    assert by_url == full
    # lineage has no orphan rows either: one row per (part, committed run)
    lin = cat.read(spark, lineage.LINEAGE_TABLE).collect()
    assert len(lin) == 8
    assert sorted({r.part_id for r in lin}) == list(range(8))


def test_resume_into_pre_day_layout_table(spark, pages, tmp_path):
    """ADVICE regression: resuming into a results table written by the
    pre-day-partitioned pipeline (no warc_day column) must match the
    EXISTING layout — mixing files with and without warc_day would make
    day-pruned reads silently drop the old rows."""
    legacy_pages = pages.drop("warc_ts")  # pre-day pipeline had no crawl ts
    cat = Catalog(str(tmp_path))
    lineage.run_extraction(spark, legacy_pages, cat, "run-old",
                           num_partitions=8, fail_after_parts=3)
    assert "warc_day" not in cat.read(spark, lineage.RESULTS_TABLE).columns

    # resume with day-carrying pages: the guard must fall back to the
    # legacy unpartitioned layout instead of mixing schemas
    s2 = lineage.run_extraction(spark, pages, cat, "run-new",
                                num_partitions=8)
    assert s2["parts_done"] == 5 and s2["parts_skipped"] == 3
    res = cat.read(spark, lineage.RESULTS_TABLE)
    assert "warc_day" not in res.columns
    assert res.count() == pages.count()
    urls = [r.url for r in res.select("url").collect()]
    assert len(urls) == len(set(urls))  # no dropped or duplicated rows


def test_lineage_carries_measured_wall_ms(spark, pages, tmp_path):
    """A8: run_extraction records REAL per-partition extraction wall time
    (not byte estimates); cost + throughput metrics consume it."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators import (
        evaluate as ev,
    )

    cat = Catalog(str(tmp_path))
    lineage.run_extraction(spark, pages, cat, "run-t", num_partitions=4)
    lin = cat.read(spark, lineage.LINEAGE_TABLE)
    rows = lin.collect()
    assert all(r.wall_ms is not None and r.wall_ms > 0 for r in rows)
    perf = ev.performance_metrics(lin).first()
    assert perf.n_docs == sum(r.n_rows for r in rows)
    assert perf.docs_per_cpu_sec > 0
    assert 0 < perf.avg_ms_per_doc < 1000  # sub-second per synthetic page
    cost = {r.part_id: r for r in ev.cost_metrics(lin).collect()}
    for r in rows:  # measured path: cost == wall_sec * rate
        exp = round(r.wall_ms / 1000.0 / 3600.0 * ev.CPU_RATE_PER_HOUR, 8)
        assert abs(cost[r.part_id].est_cost_usd - exp) < 1e-9


def test_vacuum_reclaims_expired_and_orphaned_files(spark, tmp_path):
    """Iceberg expire-snapshots analogue: files only referenced by old
    snapshots (or left behind by rollbacks) are deleted; the current
    snapshot still reads identically."""
    import os

    cat = Catalog(str(tmp_path))
    cat.overwrite("t", spark.range(10))
    cat.overwrite("t", spark.range(7))       # v1's files now unreferenced
    cat.append("t", spark.range(7, 10), txn="tx-dead")
    cat.remove_orphan_appends("t", live_txns=set())  # roll the append back
    assert cat.read(spark, "t").count() == 7

    data_root = os.path.join(str(tmp_path), "t", "data")
    def n_parquet():
        return sum(len([f for f in fs if f.endswith(".parquet")])
                   for _, _, fs in os.walk(data_root))

    before = n_parquet()
    removed = cat.vacuum("t", min_age_secs=0)
    assert removed > 0
    assert n_parquet() == before - removed
    # current data intact after GC
    assert sorted(r.id for r in cat.read(spark, "t").collect()) == list(range(7))
    # vacuum is idempotent
    assert cat.vacuum("t", min_age_secs=0) == 0


def test_txn_check_metadata_opens_stay_flat(spark, tmp_path):
    """The exactly-once replay check (txns()) runs per streaming micro-batch
    and per CLI run; its metadata cost must be O(1) file opens no matter how
    many commits the table has seen — NOT a walk of every version json, let
    alone every manifest (the round-4 regression class). 200 commits stand
    in for a stream's life; the committed txn set stays exact throughout."""
    cat = Catalog(str(tmp_path))
    df = spark.range(2)
    costs = []
    for b in range(200):
        txn = f"stream:t:{b}"
        assert txn not in cat.txns("t") if cat.exists("t") else True
        cat.append("t", df, txn=txn)
        got = cat.txns("t")
        costs.append(cat.last_txn_stats["meta_files_opened"])
        assert got == {f"stream:t:{i}" for i in range(b + 1)}
    assert max(costs) == min(costs) == 2  # _current + current snapshot only


def test_txns_survive_version_expiry(spark, tmp_path):
    """vacuum expires old v<N>.json metadata, but the cumulative all_txns
    summary in the current snapshot keeps the replay check exact — a
    replayed batch whose version json was expired must still be a no-op."""
    import os

    cat = Catalog(str(tmp_path))
    for b in range(30):
        cat.append("t", spark.range(2), txn=f"b:{b}")
        cat.vacuum("t", keep_versions=2, min_age_secs=0)
    meta = os.path.join(str(tmp_path), "t", "_meta")
    n_versions = len([f for f in os.listdir(meta)
                      if f.startswith("v") and f.endswith(".json")])
    assert n_versions <= 3  # keep_versions + current, never the full history
    assert cat.txns("t") == {f"b:{i}" for i in range(30)}
    # history compaction: one line per expired version
    hist = os.path.join(meta, "_history.json")
    assert os.path.exists(hist)
    with open(hist) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]
    assert len(lines) >= 25
    # _meta total file count is bounded (manifest merge + version expiry)
    assert len(os.listdir(meta)) < 40
    # current data unaffected
    assert cat.read(spark, "t").count() == 60


def test_meta_dir_bounded_across_append_vacuum_cycles(spark, tmp_path):
    """100 append+vacuum cycles: the _meta file count must stay flat (the
    round-4 layout kept every v<N>.json forever) and time travel within
    keep_versions must still work."""
    import os

    cat = Catalog(str(tmp_path))
    sizes = []
    meta = os.path.join(str(tmp_path), "t", "_meta")
    for b in range(100):
        cat.append("t", spark.range(1), txn=f"c:{b}")
        cat.vacuum("t", keep_versions=3, min_age_secs=0)
        sizes.append(len(os.listdir(meta)))
    # bounded: steady state (the manifest-merge tiers take ~30 cycles to
    # fill) never exceeds a flat ceiling, and shows no growth trend over
    # the back half — the round-4 layout would be >100 version jsons alone
    assert max(sizes) < 40
    assert max(sizes[80:]) <= max(sizes[30:80])
    # time travel within the retained window still resolves
    cur_v = cat._read_current("t")["version"]
    retained = [s["version"] for s in cat.snapshots("t")]
    assert cur_v in retained
    assert cat.read(spark, "t", version=retained[-2]).count() == 99
    assert cat.read(spark, "t").count() == 100


def test_rollback_never_touches_overwrite_commits(spark, tmp_path):
    """ADVICE regression: remove_orphan_appends must only roll back
    APPEND-originated manifests. An overwrite's txn (replay detection for
    index rebuilds) outside the live set must not drop the live table."""
    cat = Catalog(str(tmp_path))
    cat.overwrite("idx", spark.range(10), txn="cli:idx:rebuild-1")
    cat.append("idx", spark.range(10, 12), txn="dead-append")
    # a caller reconciling against an unrelated marker table passes a live
    # set that contains NEITHER txn: only the append may be rolled back
    removed = cat.remove_orphan_appends("idx", live_txns=set())
    assert removed > 0
    assert sorted(r.id for r in cat.read(spark, "idx").collect()) == \
        list(range(10))


def test_schema_evolution_additive_append(spark):
    """Iceberg add-column semantics: an append may carry new columns; the
    recorded schema evolves, reads use IT (not a sampled footer), and
    pre-evolution files surface null for the new columns. Type changes on
    existing columns fail loudly."""
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as tmp:
        cat = Catalog(tmp)
        cat.append("t", spark.range(3))
        cat.append("t", spark.range(3, 6).withColumn("lang", F.lit("en")))
        df = cat.read(spark, "t")
        assert df.columns == ["id", "lang"]
        rows = {r.id: r.lang for r in df.collect()}
        assert rows == {0: None, 1: None, 2: None,
                        3: "en", 4: "en", 5: "en"}
        # time travel to the pre-evolution snapshot keeps the old schema
        assert cat.read(spark, "t", version=1).columns == ["id"]
        # an append missing the evolved column still works (nulls)
        cat.append("t", spark.range(6, 7))
        assert cat.read(spark, "t").filter("id = 6").first().lang is None
        # type conflict: fail loudly, never corrupt reads
        with pytest.raises(ValueError, match="type conflict"):
            cat.append("t", spark.range(7, 8).withColumn(
                "lang", F.lit(3).cast("int")))


def test_compact_merges_small_files_preserving_rows_and_txns(spark,
                                                             tmp_path):
    """Iceberg rewriteDataFiles analogue: 20 micro-batch-style appends ->
    compact -> far fewer files, identical rows, exactly-once txn history
    intact (a replayed batch is still a no-op), rollback surgery never
    touches the compacted manifest, vacuum reclaims the superseded files."""
    import os

    cat = Catalog(str(tmp_path))
    for b in range(20):
        cat.append("t", spark.range(b * 10, b * 10 + 10), txn=f"s:{b}")
    before_files = len(cat.scan_files("t"))
    assert before_files >= 20
    stats = cat.compact(spark, "t")
    assert stats["files_after"] < before_files
    assert len(cat.scan_files("t")) == stats["files_after"]
    assert sorted(r.id for r in cat.read(spark, "t").collect()) == \
        list(range(200))
    # txn history survives compaction: replay checks stay exact
    assert cat.txns("t") == {f"s:{i}" for i in range(20)}
    # the compacted manifest is not an append: rollback surgery with a
    # foreign live set must not drop it
    assert cat.remove_orphan_appends("t", live_txns=set()) == 0
    assert cat.read(spark, "t").count() == 200
    # superseded files reclaimed; data still intact
    assert cat.vacuum("t", min_age_secs=0) > 0
    assert cat.read(spark, "t").count() == 200
    # idempotent-ish: a second compact at the same target is a no-op
    again = cat.compact(spark, "t")
    assert again["version"] is None
    data_root = os.path.join(str(tmp_path), "t", "data")
    n_parquet = sum(len([f for f in fs if f.endswith(".parquet")])
                    for _, _, fs in os.walk(data_root))
    assert n_parquet == stats["files_after"]


def test_compact_preserves_partition_layout_and_pruning(spark, tmp_path):
    """Compacting a day-partitioned table must keep the hive layout: the
    manifest-level prune opens only the matching day's files afterwards."""
    from pyspark.sql import functions as F

    cat = Catalog(str(tmp_path))
    for b in range(6):
        df = spark.range(b * 10, b * 10 + 10).withColumn(
            "day", F.when(F.col("id") % 2 == 0, "2025-01-01")
                    .otherwise("2025-01-02"))
        cat.append("t", df, txn=f"d:{b}", partition_by=["day"])
    stats = cat.compact(spark, "t", target_file_bytes=1 << 30)
    assert stats["files_after"] < stats["files_before"]
    got = cat.read(spark, "t", where={"day": "2025-01-01"})
    assert sorted(r.id for r in got.collect()) == list(range(0, 60, 2))
    st = cat.last_scan_stats
    assert st["files_selected"] < stats["files_after"]  # pruning pruned
    assert cat.read(spark, "t").count() == 60


def test_vacuum_removes_crc_sidecars_and_success_markers(spark, tmp_path):
    """When vacuum deletes a parquet file it must also delete its Hadoop
    .crc sidecar; a staging dir left with zero data files loses its _SUCCESS
    marker too (otherwise stale checksums/markers accumulate forever)."""
    import os

    cat = Catalog(str(tmp_path))
    cat.overwrite("t", spark.range(10))
    v1 = cat.snapshots("t", with_files=True)[-1]["files"]
    cat.append("t", spark.range(10, 13))  # second staging dir, still live
    cat.overwrite("t", spark.range(5))    # everything before now expired
    cat.vacuum("t", min_age_secs=0)

    data_root = os.path.join(str(tmp_path), "t", "data")
    leftovers = []
    for root, _, fs in os.walk(data_root):
        for f in fs:
            if f.endswith(".crc") and f != "._SUCCESS.crc":
                # a .crc may only exist next to its live data file
                data = os.path.join(root, f[1:-4])
                if not os.path.exists(data):
                    leftovers.append(os.path.join(root, f))
            if f == "_SUCCESS":
                has_parquet = any(x.endswith(".parquet")
                                  for x in os.listdir(root))
                if not has_parquet:
                    leftovers.append(os.path.join(root, f))
    assert leftovers == [], leftovers
    # expired v1 staging dirs are gone entirely (rmtree path)
    assert all(not os.path.exists(p) for p in v1)
    assert sorted(r.id for r in cat.read(spark, "t").collect()) == list(range(5))


def test_catalog_model_random_op_sequences(spark, tmp_path):
    """Model-based check of the whole table layer: a seeded random sequence
    of append / tagged-append / overwrite / rollback / vacuum / compact /
    schema-evolving ops is mirrored against a plain in-memory reference
    model; after every mutation the committed rows and the txn history
    must match the model exactly. Catches cross-feature interactions no
    single-feature test sees (e.g. compact after rollback after
    evolution)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(0x5EED5)
    cat = Catalog(str(tmp_path / "m"))
    model_rows: dict[int, str | None] = {}   # id -> lang (None pre-evolution)
    model_txns: set[str] = set()
    next_id = 0
    evolved = False

    def _mkdf(ids, lang=None):
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        if lang is not None:
            df = df.withColumn("lang", F.lit(lang))
        return df

    for step in range(28):
        op = rng.choice(["append", "append", "tagged", "tagged", "dead",
                         "overwrite", "vacuum", "compact"])
        ids = list(range(next_id, next_id + rng.randint(1, 4)))
        next_id = ids[-1] + 1
        if op == "append":
            lang = f"l{step}" if (evolved or rng.random() < 0.3) else None
            evolved = evolved or lang is not None
            cat.append("m", _mkdf(ids, lang))
            model_rows.update({i: lang for i in ids})
        elif op == "tagged":
            txn = f"t{step}"
            cat.append("m", _mkdf(ids, f"l{step}" if evolved else None),
                       txn=txn)
            model_txns.add(txn)
            model_rows.update({i: (f"l{step}" if evolved else None)
                               for i in ids})
        elif op == "dead":
            # torn transaction: tagged append then rollback against the
            # live set that excludes it
            txn = f"dead{step}"
            cat.append("m", _mkdf(ids, f"l{step}" if evolved else None),
                       txn=txn)
            model_txns.add(txn)  # txn history keeps rolled-back tags
            removed = cat.remove_orphan_appends(
                "m", live_txns=model_txns - {txn})
            assert removed >= 1
        elif op == "overwrite":
            txn = f"ow{step}"
            cat.overwrite("m", _mkdf(ids, f"l{step}" if evolved else None),
                          txn=txn)
            model_txns.add(txn)
            model_rows = {i: (f"l{step}" if evolved else None) for i in ids}
            evolved = evolved  # overwrite re-records ITS schema
        elif op == "vacuum":
            cat.vacuum("m", keep_versions=rng.choice([1, 2, 3]), min_age_secs=0)
        elif op == "compact":
            if cat.exists("m") and model_rows:
                st = cat.compact(spark, "m")
                assert st["files_after"] <= st["files_before"]
        if not cat.exists("m"):
            continue
        got = {(r.id, getattr(r, "lang", None))
               for r in cat.read(spark, "m").collect()}
        want = {(i, v) for i, v in model_rows.items()}
        # overwrite resets the recorded schema to the overwriting frame's:
        # pre-evolution ids then read without a lang column at all
        if got and "lang" not in cat.read(spark, "m").columns:
            want = {(i, None) for i, _ in want}
            got = {(i, None) for i, _ in got}
        assert got == want, f"step {step} op {op}"
        assert cat.txns("m") == model_txns, f"step {step} op {op}"


def test_concurrent_appends_lose_no_commits(spark, tmp_path):
    """Optimistic concurrency: parallel appends race for version files;
    losers rebase and retry, so EVERY writer's rows and txn land (the old
    last-flip-wins protocol silently dropped one of two racing commits)."""
    from concurrent.futures import ThreadPoolExecutor

    cat = Catalog(str(tmp_path))

    def one(i: int) -> int:
        return cat.append("t", spark.range(i * 10, i * 10 + 10),
                          txn=f"w:{i}")

    with ThreadPoolExecutor(max_workers=4) as ex:
        versions = list(ex.map(one, range(8)))
    assert sorted(versions) == list(range(1, 9))  # serialized, none lost
    assert sorted(r.id for r in cat.read(spark, "t").collect()) == \
        list(range(80))
    assert cat.txns("t") == {f"w:{i}" for i in range(8)}


def test_commit_survives_stale_or_missing_hint(spark, tmp_path):
    """The atomic v<N>.json link IS the commit point; _current is only an
    advisory hint. A writer that crashed between the link and the hint
    write (or a racing hint write that REGRESSED the pointer) must leave a
    fully visible commit: readers probe forward, the next append continues
    at v<N+1>, and no manual repair step exists — the round-5 liveness
    hole (a wedged claimed-but-unflipped version) is structurally gone."""
    import os

    cat = Catalog(str(tmp_path))
    cat.append("t", spark.range(5), txn="a")
    cat.append("t", spark.range(5, 8), txn="b")
    hint = os.path.join(str(tmp_path), "t", "_meta", "_current")
    # simulate the crash/regression: the hint says v1 while v2 is durable
    with open(hint, "w") as f:
        f.write("1")
    assert cat.read(spark, "t").count() == 8          # probe found v2
    assert [s["version"] for s in cat.snapshots("t")] == [1, 2]
    assert cat.read(spark, "t", version=2).count() == 8  # time travel too
    assert cat.txns("t") == {"a", "b"}
    cat.append("t", spark.range(8, 10), txn="c")      # continues at v3
    assert cat._read_current("t")["version"] == 3
    with open(hint) as f:
        assert f.read().strip() == "3"                 # hint self-healed
    # a MISSING hint recovers from the directory listing
    os.remove(hint)
    assert cat.read(spark, "t").count() == 10
    cat.append("t", spark.range(10, 11), txn="d")
    assert cat._read_current("t")["version"] == 4


def test_vacuum_age_gate_protects_inflight_commit(spark, tmp_path):
    """A commit in flight has staged data + a manifest on disk that no
    snapshot references YET (the snapshot link comes last). Vacuum must
    not reclaim such young unreferenced files (ADVICE round-5: deleting
    them let the subsequent link publish a snapshot over deleted files);
    past the age gate they are genuine orphans and go."""
    import os

    cat = Catalog(str(tmp_path))
    cat.append("t", spark.range(5))
    # simulate the in-flight writer: stage data + manifest, no snapshot yet
    rows = cat._stage("t", spark.range(100, 105), txn="inflight")
    entry = cat._write_manifest("t", rows, ["inflight"])
    stage_dir = os.path.dirname(rows[0]["path"])
    while os.path.basename(os.path.dirname(stage_dir)) != "data":
        stage_dir = os.path.dirname(stage_dir)
    assert cat.vacuum("t") == 0                        # age gate: untouched
    assert os.path.exists(entry["manifest"])
    assert all(os.path.exists(r["path"]) for r in rows)
    # ...so the in-flight writer can still land its commit afterwards
    cat._commit("t", (cat._read_current("t")["manifests"]) + [entry],
                "append", 1, txn="inflight",
                schema=cat._read_current("t").get("schema"),
                all_txns=cat._parent_txns("t", cat._read_current("t")))
    assert cat.read(spark, "t").count() == 10
    # a genuinely dead orphan (same shape, past the gate) is reclaimed
    dead = cat._stage("t", spark.range(200, 203), txn="dead")
    dentry = cat._write_manifest("t", dead, ["dead"])
    old = 10_000
    ddir = os.path.dirname(dead[0]["path"])

    def _backdate(p):
        os.utime(p, (os.path.getmtime(p) - old, os.path.getmtime(p) - old))

    _backdate(dentry["manifest"])
    _backdate(ddir)
    for root, dirs, fs in os.walk(ddir):
        for name in dirs + fs:  # incl. _SUCCESS/.crc markers — the gate
            _backdate(os.path.join(root, name))  # takes the NEWEST mtime
    assert cat.vacuum("t") == len(dead)
    assert not os.path.exists(dentry["manifest"])
    assert cat.read(spark, "t").count() == 10


def test_compact_rebases_over_concurrent_append(spark, tmp_path):
    """Round-5 verdict #1: a compact that loses its version race to an
    append must REBASE (keep the racing append's manifest — disjoint new
    data — and replace only the manifests it rewrote), not abort. Zero
    rows lost on either side; txn history intact."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources.tables import (
        Catalog as Cat,
    )

    class RacyCatalog(Cat):
        """Injects one racing append between compact's snapshot read and
        its commit attempt — a deterministic replay of the streaming-sink
        race."""
        raced = False

        def _commit(self, table, manifests, operation, parent, **kw):
            if operation == "compact" and not self.raced:
                self.raced = True
                Cat(self.root).append(table, spark.range(900, 905),
                                      txn="racer")
            return super()._commit(table, manifests, operation, parent, **kw)

    cat = RacyCatalog(str(tmp_path))
    for i in range(6):
        cat.append("t", spark.range(i * 10, i * 10 + 10).coalesce(1),
                   txn=f"s:{i}")
    stats = cat.compact(spark, "t", target_file_bytes=1 << 30)
    assert cat.raced and stats["version"] is not None
    got = sorted(r.id for r in cat.read(spark, "t").collect())
    assert got == sorted(list(range(60)) + list(range(900, 905)))
    assert cat.txns("t") == {f"s:{i}" for i in range(6)} | {"racer"}
    ops = [s["operation"] for s in cat.snapshots("t")]
    assert ops[-1] == "compact" and "append" in ops[-3:]


def test_compact_rebase_handles_merge_mixed_manifest(spark, tmp_path):
    """Hardest rebase case: the racing append's small-manifest merge folds
    manifests compact REWROTE together with the racer's NEW rows into one
    manifest. The rebase must split that manifest — dropping the replaced
    rows (the compacted entry carries them) while keeping the racer's."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources import tables as T

    class RacyCatalog(T.Catalog):
        raced = False

        def _commit(self, table, manifests, operation, parent, **kw):
            if operation == "compact" and not self.raced:
                self.raced = True
                # MERGE_MIN small manifests exist -> this append merges
                T.Catalog(self.root).append(
                    table, spark.range(900, 903).coalesce(1), txn="racer")
            return super()._commit(table, manifests, operation, parent, **kw)

    cat = RacyCatalog(str(tmp_path))
    for i in range(T.MERGE_MIN - 1):
        cat.append("t", spark.range(i * 3, i * 3 + 3).coalesce(1),
                   txn=f"s:{i}")
    assert len(cat._read_current("t")["manifests"]) == T.MERGE_MIN - 1
    stats = cat.compact(spark, "t", target_file_bytes=1 << 30)
    assert cat.raced and stats["version"] is not None
    got = sorted(r.id for r in cat.read(spark, "t").collect())
    want = sorted(list(range(3 * (T.MERGE_MIN - 1))) + [900, 901, 902])
    assert got == want
    # the racer's rows stayed ROLLBACK-REACHABLE (its manifest survived
    # with its txn; compact's own entry is untagged by design)
    removed = cat.remove_orphan_appends(
        "t", live_txns={f"s:{i}" for i in range(T.MERGE_MIN - 1)})
    assert removed >= 1
    assert sorted(r.id for r in cat.read(spark, "t").collect()) == \
        sorted(range(3 * (T.MERGE_MIN - 1)))


def test_compact_aborts_when_concurrent_rollback_removed_rows(spark,
                                                              tmp_path):
    """A concurrent ROLLBACK removes rows compact already folded into its
    rewrite; rebasing would resurrect them — compact must abort loudly."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources.tables import (
        Catalog as Cat,
        ConcurrentCommitError,
    )

    class RacyCatalog(Cat):
        raced = False

        def _commit(self, table, manifests, operation, parent, **kw):
            if operation == "compact" and not self.raced:
                self.raced = True
                other = Cat(self.root)
                other.remove_orphan_appends(
                    table, live_txns={"keep-0", "keep-1"})
            return super()._commit(table, manifests, operation, parent, **kw)

    cat = RacyCatalog(str(tmp_path))
    cat.append("t", spark.range(10).coalesce(1), txn="keep-0")
    cat.append("t", spark.range(10, 20).coalesce(1), txn="keep-1")
    cat.append("t", spark.range(20, 30).coalesce(1), txn="torn")
    with pytest.raises(ConcurrentCommitError, match="stale"):
        cat.compact(spark, "t", target_file_bytes=1 << 30)
    # the rollback's result is intact; compact's staged output is orphaned
    assert sorted(r.id for r in cat.read(spark, "t").collect()) == \
        list(range(20))


def test_compact_commits_under_sustained_appends(spark, tmp_path):
    """The round-5 'done' bar: a background writer appending continuously
    (a streaming sink stand-in) while compact runs — compact must commit
    within its retry budget and ZERO rows may be lost on either side."""
    import threading
    import time as _time

    cat = Catalog(str(tmp_path))
    for i in range(8):
        cat.append("t", spark.range(i * 10, i * 10 + 10).coalesce(1),
                   txn=f"pre:{i}")

    stop = threading.Event()
    appended: list[int] = []

    def appender():
        i = 0
        while not stop.is_set() and i < 40:
            lo = 1000 + i * 5
            Catalog(str(tmp_path)).append(
                "t", spark.range(lo, lo + 5).coalesce(1), txn=f"bg:{i}")
            appended.append(i)
            i += 1
            _time.sleep(0.05)

    th = threading.Thread(target=appender, daemon=True)
    th.start()
    try:
        _time.sleep(0.15)  # let a few appends land first
        stats = cat.compact(spark, "t", target_file_bytes=1 << 30)
    finally:
        stop.set()
        th.join(timeout=60)
    assert stats["version"] is not None  # committed despite contention
    want = set(range(80))
    for i in appended:
        want |= set(range(1000 + i * 5, 1000 + i * 5 + 5))
    got = sorted(r.id for r in cat.read(spark, "t").collect())
    assert got == sorted(want)
    assert {f"bg:{i}" for i in appended} <= cat.txns("t")


def test_commit_crash_injection_invariants(spark, tmp_path):
    """Prescription #6: randomized crash injection at every commit step.
    Invariants after ANY crash point: (1) the table stays readable with
    exactly the acked rows, (2) an unacked commit is either fully
    invisible or — iff the crash hit AFTER the atomic snapshot link —
    fully visible with its txn recorded, (3) the next writer always
    succeeds with no manual repair."""
    import os
    import random

    from _intelligent_document_ai_for_field_extraction_from_invoices_spark.sources import tables as T

    class Boom(RuntimeError):
        pass

    class CrashyCatalog(T.Catalog):
        crash_at = None  # "pre_link" | "post_link" (pre hint) | None

        def _commit(self, table, manifests, operation, parent, **kw):
            if self.crash_at == "pre_link":
                raise Boom("crashed before the snapshot link")
            if self.crash_at == "post_link":
                real_replace = os.replace

                def no_hint(src, dst):
                    if dst.endswith("_current"):
                        os.remove(src)
                        raise Boom("crashed before the hint write")
                    return real_replace(src, dst)

                os.replace = no_hint
                try:
                    return super()._commit(table, manifests, operation,
                                            parent, **kw)
                finally:
                    os.replace = real_replace
            return super()._commit(table, manifests, operation, parent, **kw)

    rng = random.Random(77)
    cat = CrashyCatalog(str(tmp_path))
    model_rows: set[int] = set()
    model_txns: set[str] = set()
    nxt = 0
    for step in range(30):
        ids = list(range(nxt, nxt + 3))
        nxt += 3
        txn = f"t{step}"
        cat.crash_at = rng.choice([None, None, "pre_link", "post_link"])
        try:
            cat.append("t", spark.range(ids[0], ids[-1] + 1).coalesce(1),
                       txn=txn)
            landed = True
        except Boom:
            landed = False
        cat.crash_at = None
        if landed or cat.exists("t"):
            got_txns = cat.txns("t")
        if landed:
            model_rows.update(ids)
            model_txns.add(txn)
        elif cat.exists("t") and txn in got_txns:
            # crash AFTER the link: the commit is durable (and correctly
            # so — the link is the commit point); the writer's retry/replay
            # layer would detect it via the txn check, exactly once
            model_rows.update(ids)
            model_txns.add(txn)
        if not cat.exists("t"):
            continue
        assert {r.id for r in cat.read(spark, "t").collect()} == model_rows
        assert cat.txns("t") == model_txns
    assert model_txns  # the walk exercised real commits
    # and the table is never wedged: a clean writer always proceeds
    v = cat.append("t", spark.range(500, 502), txn="final")
    assert v == cat._read_current("t")["version"]
    assert {r.id for r in cat.read(spark, "t").collect()} == \
        model_rows | {500, 501}


# -- incremental (CDC-style) reads ------------------------------------------


def test_read_incremental_appends_tagged_by_commit(spark, tmp_path):
    """(since, until] append deltas come back exactly once, tagged with
    the committing version + txn; since=0 streams the full history;
    since==until (and polling an absent table) is an empty feed."""
    cat = Catalog(str(tmp_path))
    assert cat.read_incremental(spark, "t", 0).count() == 0  # pre-creation
    v1 = cat.overwrite("t", spark.range(3).withColumn("v", F.col("id")))
    v2 = cat.append("t", spark.range(3, 7).withColumn("v", F.col("id")),
                    txn="run-a")
    v3 = cat.append("t", spark.range(7, 9).withColumn("v", F.col("id")),
                    txn="run-b")
    delta = cat.read_incremental(spark, "t", v1).orderBy("id").collect()
    assert [r.id for r in delta] == [3, 4, 5, 6, 7, 8]
    assert {r._commit_version for r in delta} == {v2, v3}
    assert {r._commit_txn for r in delta if r.id < 7} == {"run-a"}
    assert {r._commit_txn for r in delta if r.id >= 7} == {"run-b"}
    # full history: the creating overwrite is a pure insert
    assert cat.read_incremental(spark, "t", 0).count() == 9
    # bounded until + empty range
    assert cat.read_incremental(spark, "t", v1, v2).count() == 4
    assert cat.read_incremental(spark, "t", v3, v3).count() == 0
    with pytest.raises(ValueError):
        cat.read_incremental(spark, "t", v3 + 1)


def test_read_incremental_skips_compact_rejects_removals(spark, tmp_path):
    """Compaction rewrites files without changing rows -> contributes
    nothing to the feed; overwrite/rollback in range raise (an added-rows
    feed cannot express removals)."""
    cat = Catalog(str(tmp_path))
    v1 = cat.overwrite("t", spark.range(4))
    cat.append("t", spark.range(4, 6), txn="keep")
    stats = cat.compact(spark, "t")
    vc = stats["version"]
    delta = cat.read_incremental(spark, "t", v1, vc).orderBy("id").collect()
    assert [r.id for r in delta] == [4, 5]  # compact contributed nothing
    # appends after the compact still flow
    v4 = cat.append("t", spark.range(6, 8))
    assert cat.read_incremental(spark, "t", vc, v4).count() == 2
    # overwrite mid-history is a removal -> refuse
    v5 = cat.overwrite("t", spark.range(2))
    with pytest.raises(ValueError, match="overwrite"):
        cat.read_incremental(spark, "t", v4, v5)


def test_read_incremental_random_histories_match_model(spark, tmp_path):
    """Model-based check: random append/compact histories -> every
    (since, until) window's incremental read equals the model's 'rows
    added by appends in range', tagged with the right commit version;
    windows crossing an overwrite raise."""
    import random

    rng = random.Random(20260817)
    next_id = [0]

    def fresh_rows(n):
        ids = list(range(next_id[0], next_id[0] + n))
        next_id[0] += n
        return ids

    cat = Catalog(str(tmp_path))
    # model: version -> (op, ids-added)
    history = {}
    v = cat.overwrite("t", spark.range(0, 4).withColumn(
        "v", F.col("id")))
    history[v] = ("overwrite", list(range(4)))
    next_id[0] = 4
    for step in range(8):
        op = rng.choice(["append", "append", "append", "compact"])
        if op == "append":
            ids = fresh_rows(rng.randint(1, 5))
            df = spark.createDataFrame([(i, i) for i in ids],
                                       "id long, v long")
            v = cat.append("t", df, txn=f"s{step}")
            history[v] = ("append", ids)
        else:
            cv = cat.compact(spark, "t")["version"]
            if cv is not None:  # no-op compact (already right-sized)
                history[cv] = ("compact", [])
    versions = sorted(history)
    for _ in range(12):
        a, b = sorted(rng.sample(versions, 2))
        window_ops = [history[x][0] for x in versions if a < x <= b]
        if "overwrite" in window_ops:
            with pytest.raises(ValueError):
                cat.read_incremental(spark, "t", a, b).collect()
            continue
        expect = {}
        for x in versions:
            if a < x <= b and history[x][0] == "append":
                for i in history[x][1]:
                    expect[i] = x
        got = {r.id: r._commit_version
               for r in cat.read_incremental(spark, "t", a, b).collect()}
        assert got == expect, (a, b)
