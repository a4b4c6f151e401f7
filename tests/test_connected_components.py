"""Near-dup clustering: connected components + keep-one corpus filter."""

import pytest
from pyspark.sql import functions as F

from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators import (
    dedup,
)


@pytest.fixture()
def graph(spark):
    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (edge)
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_components_label_by_min_member(spark, graph):
    got = {r.doc_id: r.component_id
           for r in dedup.connected_components(graph).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}
    dedup.release_caches()


def test_components_converge_on_long_chain(spark, monkeypatch):
    """A 64-node chain has diameter 63 — pointer jumping must converge in
    O(log diameter) rounds (~8), nowhere near the naive ~diameter count.
    (UF_BREAK_MAX=0 so the driver union-find doesn't close the tiny graph
    before the distributed rounds run.)"""
    monkeypatch.setattr(dedup, "UF_BREAK_MAX", 0)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long")
    got = dedup.connected_components(chain, max_iters=12).collect()
    assert {r.component_id for r in got} == {0}
    assert len(got) == 64
    dedup.release_caches()


def test_components_raise_instead_of_partial_labels(spark, monkeypatch):
    # the driver union-find would (correctly) close a tiny residual graph,
    # so disable it to exercise the distributed non-convergence guard
    monkeypatch.setattr(dedup, "UF_BREAK_MAX", 0)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup.connected_components(chain, max_iters=2)
    dedup.release_caches()


def test_long_chain_closed_by_driver_union_find(spark):
    # same 30-node chain, default bounds: the symmetrized edge set is
    # already under UF_BREAK_MAX, so the r7 EARLY driver union-find
    # closes it with zero Spark rounds — every node still lands in the
    # single min-labelled component
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long")
    comps = dedup.connected_components(chain, max_iters=2)
    rows = comps.collect()
    assert {r.component_id for r in rows} == {0}
    assert len(rows) == 31
    assert dedup.CC_LAST_STATS.get("driver_uf_edges", 0) > 0
    dedup.release_caches()


def test_keep_canonical_filters_non_canonical_members(spark, graph):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]],
        "doc_id long, text string")
    comps = dedup.connected_components(graph)
    kept = sorted(r.doc_id for r in dedup.keep_canonical(docs, comps).collect())
    # canonical member of each cluster + the unclustered doc survive
    assert kept == [1, 10, 20, 99]
    dedup.release_caches()


def test_no_residual_caches_after_components(spark, graph):
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    dedup.connected_components(graph).collect()
    dedup.release_caches()
    after = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    assert after - before == set()


def test_components_empty_pair_set_returns_empty(spark):
    """sum() over zero rows is null — the convergence check must coalesce it
    or an all-unique corpus spins max_iters and raises (review finding)."""
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.connected_components(empty).collect() == []
    dedup.release_caches()


def test_components_match_union_find_on_random_graphs(spark):
    """Property: the distributed labelling equals a reference union-find on
    seeded random graphs (mix of sparse chains and dense blobs)."""
    import random

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = random.Random(1234)
    for trial in range(3):
        n = rng.randint(30, 120)
        m = rng.randint(n // 2, n * 2)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) if a < b else (b, a) for a, b in edges if a != b]
        if not edges:
            continue
        expected = union_find(edges)
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r.doc_id: r.component_id
               for r in dedup.connected_components(df).collect()}
        assert got == expected, f"trial {trial}"
        dedup.release_caches()


def test_components_localcheckpoint_path_on_large_graph(spark):
    """250k nodes crosses collect_break_max, so the per-round leaf resets
    take the localCheckpoint tier instead of the driver round-trip — the
    path a 10^12-row corpus would live on. Star clusters of 10 converge on
    the round-1 fast path; every node must be labelled with its hub."""
    from pyspark.sql import functions as F

    n = 250_000
    edges = spark.range(n).selectExpr(
        "id AS doc_a", "id - (id % 10) AS doc_b").filter("doc_a != doc_b")
    comps = dedup.connected_components(edges)
    assert comps.count() == n
    wrong = comps.filter(
        F.col("component_id") != F.col("doc_id") - (F.col("doc_id") % 10)
    ).count()
    assert wrong == 0
    dedup.release_caches()


def test_cc_stats_record_fastpath_and_rounds(spark, monkeypatch):
    """CC_LAST_STATS observability: a clique converges on the round-1 fast
    path; a long chain takes multiple rounds with a shrinking edge set.
    (UF_BREAK_MAX=0: the distributed paths are what this test pins; small
    graphs otherwise take the r7 early driver union-find.)"""
    monkeypatch.setattr(dedup, "UF_BREAK_MAX", 0)
    clique = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(a + 1, 6)],
        "doc_a long, doc_b long")
    dedup.connected_components(clique).collect()
    assert dedup.CC_LAST_STATS["fastpath"] is True
    assert dedup.CC_LAST_STATS["rounds"] == 1
    dedup.release_caches()

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long")
    dedup.connected_components(chain).collect()
    st = dedup.CC_LAST_STATS
    assert st["fastpath"] is False and st["rounds"] >= 2
    counts = st["edge_counts"]
    assert counts[0] == 126 and counts[-1] == 0
    assert all(b < a for a, b in zip(counts, counts[1:]))  # strictly shrinks
    dedup.release_caches()


def test_early_driver_uf_matches_distributed_labels(spark, monkeypatch):
    """r7 early-path pin: on a mixed graph (chains + cliques + isolated
    edges) the early driver union-find must produce EXACTLY the labels the
    distributed contraction loop produces."""
    edges = (
        [(i, i + 1) for i in range(0, 20)]              # 21-node chain
        + [(a, b) for a in range(100, 106)
           for b in range(a + 1, 106)]                  # 6-clique
        + [(200, 201), (300, 350)]                      # isolated edges
    )
    g = spark.createDataFrame(edges, "doc_a long, doc_b long")
    early = {(r.doc_id, r.component_id)
             for r in dedup.connected_components(g).collect()}
    assert dedup.CC_LAST_STATS["rounds"] == 0
    assert dedup.CC_LAST_STATS["driver_uf_edges"] == 2 * len(edges)
    dedup.release_caches()
    monkeypatch.setattr(dedup, "UF_BREAK_MAX", 0)
    dist = {(r.doc_id, r.component_id)
            for r in dedup.connected_components(g).collect()}
    assert early == dist
    dedup.release_caches()
