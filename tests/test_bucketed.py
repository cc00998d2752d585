"""Bucketed co-located join: assert the join plan has NO shuffle (Exchange).

This is the D2 co-location idea applied to the batch star schema: pay the
shuffle once at write time, never again per query.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path):
    # managed tables land in the session warehouse; isolate per test run
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(warehouse, sf_dir):
    spark = warehouse
    from tranquility_spark.sources.bucketed import bucketed_join, write_bucketed
    from tranquility_spark.sources.files import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 4)
    write_bucketed(li, "b_lineitem", "l_orderkey", 4)

    # at test scale the planner would broadcast (also shuffle-free, but that
    # proves nothing); disable it to exercise the big-big join path bucketing
    # is for — at 100 TB neither side of orders⋈lineitem broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        # and it is the same result as the plain join
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture()
def lsh_warehouse(spark):
    for t in ("b_lsh_index", "b_lsh_index_gated"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield spark
    for t in ("b_lsh_index", "b_lsh_index_gated"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_lsh_index_probe_corpus_side_no_exchange(lsh_warehouse, sf_dir):
    """The dd8 100 TB serving claim, plan-asserted: an LSH band index
    written bucketed by (band, bhash) is probed by a new batch with NO
    Exchange on the corpus side — only the new batch shuffles, so the
    per-cycle cost is O(new batch), independent of corpus size. (This is
    why incremental_neardup_pairs joins new×index directly instead of
    unioning first — a union erases the bucketed layout.)"""
    spark = lsh_warehouse
    from tranquility_spark.operators.dedup import lsh_band_index
    from tranquility_spark.sources.bucketed import write_bucketed
    from tranquility_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = lsh_band_index(docs.filter(F.col("doc_id") % 5 != 0))
    write_bucketed(corpus, "b_lsh_index", ["band", "bhash"], 4)

    new_banded = lsh_band_index(docs.filter(F.col("doc_id") % 5 == 0))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = new_banded.alias("l").join(
            spark.table("b_lsh_index").alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") != F.col("r.id")),
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly one shuffle: the NEW side repartitions to meet the bucket
        # layout; the bucketed corpus scan must not be followed by one
        assert plan.count("Exchange") == 1, plan
        assert probe.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture()
def sbbf_warehouse(spark):
    spark.sql("DROP TABLE IF EXISTS b_sbbf_blocks")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_sbbf_blocks")


def test_bucketed_sbbf_probe_filter_side_no_exchange(sbbf_warehouse, sf_dir):
    """The split-block bloom's beyond-broadcast serving claim,
    plan-asserted: a block table persisted bucketed on block_idx is probed
    with NO Exchange on the filter side — only the probe frame shuffles
    once to meet the bucket layout, so probing cost is O(probe batch)
    however large the filter is."""
    spark = sbbf_warehouse
    from tranquility_spark.operators.bloom import sbbf_blocks, sbbf_probe
    from tranquility_spark.sources.bucketed import write_bucketed
    from tranquility_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    write_bucketed(
        sbbf_blocks(corpus, "doc_id", n_blocks=128), "b_sbbf_blocks", "block_idx", 4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probed = sbbf_probe(
            docs, spark.table("b_sbbf_blocks"), "doc_id", n_blocks=128
        )
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # and the one-join probe still has no false negatives
        n_corpus = corpus.count()
        assert (
            probed.filter((F.col("doc_id") % 7 != 0) & (F.col("in_sbbf") == 1)).count()
            == n_corpus
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture()
def sbbf_gate_warehouse(spark):
    for t in ("b_lsh_index_sg", "b_sbbf_gate"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    yield spark
    for t in ("b_lsh_index_sg", "b_sbbf_gate"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_sbbf_gate_then_index_probe_no_filter_side_exchange(
    sbbf_gate_warehouse, sf_dir
):
    """The beyond-broadcast-fit gate composition: SBBF gate blocks AND the
    LSH index both persisted bucketed (block_idx / (band, bhash)). The
    per-cycle plan shuffles ONLY the new batch — once onto the gate's
    block layout, once onto the index's bucket layout — while both
    persisted structures scan exchange-free at any size. This is the
    'partition the gate' path index_bucket_bloom's docstring reserves for
    past-broadcast scale."""
    spark = sbbf_gate_warehouse
    from tranquility_spark.operators.dedup import (
        gate_probe_sbbf,
        index_bucket_sbbf,
        lsh_band_index,
    )
    from tranquility_spark.sources.bucketed import write_bucketed
    from tranquility_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    corpus = lsh_band_index(docs.filter(F.col("doc_id") % 5 != 0))
    write_bucketed(corpus, "b_lsh_index_sg", ["band", "bhash"], 4)
    write_bucketed(index_bucket_sbbf(corpus), "b_sbbf_gate", "block_idx", 4)

    new_banded = lsh_band_index(docs.filter(F.col("doc_id") % 5 == 0))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        gated = (
            gate_probe_sbbf(new_banded, spark.table("b_sbbf_gate"))
            .filter(F.col("__in_gate") == 1)
            .drop("__in_gate")
        )
        probe = gated.alias("l").join(
            spark.table("b_lsh_index_sg").alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") != F.col("r.id")),
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # two hash exchanges, both on the NEW side (gate layout + index
        # layout); neither bucketed scan is followed by one
        assert plan.count("Exchange hashpartitioning") == 2, plan
        assert "BroadcastExchange" not in plan, plan
        assert probe.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_lsh_probe_with_bloom_gate_corpus_side_no_exchange(
    lsh_warehouse, sf_dir
):
    """dd11's scale contract: composing the bloom gate in front of the
    index probe must not disturb the bucketed corpus layout — the gate is
    a broadcast crossJoin + filter on the NEW side only, so the plan still
    has exactly one Exchange (the new side meeting the bucket layout) plus
    the gate's broadcast."""
    spark = lsh_warehouse
    from tranquility_spark.operators.dedup import (
        gate_probe,
        index_bucket_bloom,
        lsh_band_index,
    )
    from tranquility_spark.sources.bucketed import write_bucketed
    from tranquility_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    write_bucketed(
        lsh_band_index(docs.filter(F.col("doc_id") % 5 != 0)),
        "b_lsh_index_gated",
        ["band", "bhash"],
        4,
    )
    corpus = spark.table("b_lsh_index_gated")
    # production persists the gate next to the index; materialize here so
    # the probe plan reflects serving (the gate BUILD's own groupBy
    # exchange is a one-time write cost, not part of the per-cycle plan)
    gate = index_bucket_bloom(corpus).localCheckpoint(eager=True)
    new_banded = lsh_band_index(docs.filter(F.col("doc_id") % 5 == 0))
    gated = (
        gate_probe(new_banded, gate)
        .filter(F.col("__in_gate") == 1)
        .drop("__in_gate")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = gated.alias("l").join(
            corpus.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") != F.col("r.id")),
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # one hash Exchange (new side); the gate adds only broadcasts
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert probe.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_simhash_served_pairs_zero_corpus_shuffle(spark, sf_dir):
    """dd19's serving claim, plan-asserted (r13, VERDICT r12 #3): full
    pair extraction from the persisted bucketed simhash index has NO
    corpus-side shuffle and NO re-hash. The distinct over
    (sighex, band, bval) collapses onto the bucketed scan (grouping keys
    are a superset of the bucket key — two HashAggregates, no Exchange),
    the banded candidate self-join is co-located, and the only shuffle
    in the whole serving plan is the dropDuplicates over the
    kilobyte-scale hash pairs. The signature UDF never appears: the text
    was hashed once at ingest by simhash_index_write."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.dedup import (
        simhash_index_write,
        simhash_neardup_pairs,
        simhash_pairs_from_index,
    )
    from tranquility_spark.sources.files import load_table

    spark.sql("DROP TABLE IF EXISTS b_simhash_served")
    try:
        docs = load_table(spark, sf_dir, "documents")
        simhash_index_write(docs, "b_simhash_served", num_buckets=4)
        idx = spark.table("b_simhash_served")

        # candidate stage under forced SortMergeJoin: ZERO exchanges —
        # the strictest form of "no corpus-side shuffle"
        ds = idx.select("sighex", "band", "bval").distinct()
        cand = ds.alias("a").join(
            ds.alias("b"),
            (FF.col("a.band") == FF.col("b.band"))
            & (FF.col("a.bval") == FF.col("b.bval"))
            & (FF.col("a.sighex") <= FF.col("b.sighex")),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = cand._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange") == 0, plan
            assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # full serving plan under defaults: exactly one shuffle (the
        # hash-pair dropDuplicates) and no Python eval node — nothing
        # re-hashes the corpus at query time
        pairs = simhash_pairs_from_index(idx, threshold=3)
        full = pairs._jdf.queryExecution().executedPlan().toString()
        assert full.count("Exchange hashpartitioning") == 1, full
        assert "BatchEvalPython" not in full and "ArrowEvalPython" not in full

        # and the served output IS the inline pipeline's output
        got = sorted(map(tuple, pairs.collect()))
        want = sorted(map(tuple, simhash_neardup_pairs(docs, threshold=3).collect()))
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS b_simhash_served")


def test_bucketed_minhash_served_pairs_zero_corpus_shuffle(spark, sf_dir):
    """dd20's serving claim, plan-asserted — the dd19 test's shape on the
    FIRST signature family: full pair extraction from the persisted
    bucketed LSH index has no corpus-side shuffle (distinct collapses onto
    the bucketed scan, candidate self-join co-located) and no Python eval
    node (no shingling/permutation UDF at query time), and the served
    output equals the guarded inline pipeline."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.dedup import (
        minhash_index_write,
        minhash_lsh_pairs_distinct,
        minhash_pairs_from_index,
    )
    from tranquility_spark.sources.files import load_table

    spark.sql("DROP TABLE IF EXISTS b_minhash_served")
    try:
        docs = load_table(spark, sf_dir, "documents")
        minhash_index_write(docs, "b_minhash_served", num_buckets=4)
        idx = spark.table("b_minhash_served")

        ds = idx.select("sig", "band", "bhash").distinct()
        cand = ds.alias("a").join(
            ds.alias("b"),
            (FF.col("a.band") == FF.col("b.band"))
            & (FF.col("a.bhash") == FF.col("b.bhash"))
            & (FF.col("a.sig") <= FF.col("b.sig")),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = cand._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange") == 0, plan
            assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        pairs = minhash_pairs_from_index(idx, num_hashes=64, threshold=0.5)
        full = pairs._jdf.queryExecution().executedPlan().toString()
        assert full.count("Exchange hashpartitioning") == 1, full
        assert "BatchEvalPython" not in full and "ArrowEvalPython" not in full

        got = sorted(map(tuple, pairs.collect()))
        want = sorted(
            map(tuple, minhash_lsh_pairs_distinct(docs, threshold=0.5).collect())
        )
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS b_minhash_served")


def test_register_bucketed_restores_layout_across_sessions(spark, sf_dir, tmp_path):
    """r13: the serving-index session-restart story — write_bucketed with an
    explicit path makes the table EXTERNAL; after the in-memory catalog
    forgets it (simulated by DROP TABLE, which keeps external files),
    register_bucketed restores the SAME bucketed plan from the surviving
    files with one DDL statement: no rebuild, no re-hash, identical rows,
    bucketing recognized by the scan."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.dedup import simhash_index_write
    from tranquility_spark.sources.bucketed import register_bucketed
    from tranquility_spark.sources.files import load_table

    loc = str(tmp_path / "simhash_ext")
    spark.sql("DROP TABLE IF EXISTS b_simhash_ext")
    try:
        docs = load_table(spark, sf_dir, "documents").limit(500)
        simhash_index_write(docs, "b_simhash_ext", num_buckets=4, path=loc)
        before = sorted(map(tuple, spark.table("b_simhash_ext").collect()))
        # the catalog forgets; the files survive (external location)
        spark.sql("DROP TABLE b_simhash_ext")
        import os

        assert os.path.exists(os.path.join(loc, "_SUCCESS"))
        register_bucketed(
            spark,
            "b_simhash_ext",
            "id BIGINT, sighex STRING, band INT, bval STRING",
            ["band", "bval"],
            4,
            loc,
        )
        after = sorted(map(tuple, spark.table("b_simhash_ext").collect()))
        assert after == before and after
        ds = spark.table("b_simhash_ext").select("sighex", "band", "bval").distinct()
        cand = ds.alias("a").join(
            ds.alias("b"),
            (FF.col("a.band") == FF.col("b.band"))
            & (FF.col("a.bval") == FF.col("b.bval")),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = cand._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange") == 0, plan
            assert "Bucketed: true" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_simhash_ext")


def test_bucketed_simhash_index_probe_corpus_side_no_exchange(spark, sf_dir):
    """dd18's 100 TB serving claim, plan-asserted (the dd8 test's shape on
    the SimHash family): a simhash_band_index written bucketed by
    (band, bval) is probed by a new batch's distinct signatures with NO
    Exchange on the corpus side — only the batch shuffles, so the
    per-cycle cost is independent of corpus size."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.dedup import simhash_band_index
    from tranquility_spark.sources.bucketed import write_bucketed
    from tranquility_spark.sources.files import load_table

    spark.sql("DROP TABLE IF EXISTS b_simhash_index")
    try:
        docs = load_table(spark, sf_dir, "documents")
        corpus = simhash_band_index(docs.filter(FF.col("doc_id") % 5 != 0))
        write_bucketed(
            corpus.select("sighex", "band", "bval").distinct(),
            "b_simhash_index",
            ["band", "bval"],
            4,
        )
        new_h = (
            simhash_band_index(docs.filter(FF.col("doc_id") % 5 == 0))
            .select("sighex", "band", "bval")
            .distinct()
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = new_h.alias("l").join(
                spark.table("b_simhash_index").alias("r"),
                (FF.col("l.band") == FF.col("r.band"))
                & (FF.col("l.bval") == FF.col("r.bval")),
            )
            plan = probe._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            # exactly two Exchanges, both the NEW side's (its distinct +
            # meeting the bucket layout): the bucketed corpus scan feeds
            # the join through Sort/Filter only — if it needed a shuffle
            # the count would be 3
            assert plan.count("Exchange") == 2, plan
            assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
            assert probe.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_simhash_index")


def test_bucketed_join_composite_key_no_exchange(spark, sf_dir, tmp_path):
    """r14 code-review: bucketed_join must cover the FULL composite bucket
    key — the single-key form over a composite-bucketed table silently
    reinstates the Exchange. The list form keeps the plan shuffle-free."""
    from tranquility_spark.sources.bucketed import bucketed_join, write_bucketed
    from tranquility_spark.sources.files import load_table

    for t in ("bc_left", "bc_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("band"),
        (F.col("event_id") % 97).alias("bhash"),
        "value",
    )
    write_bucketed(ev, "bc_left", ["band", "bhash"], 4)
    write_bucketed(ev.select("band", "bhash"), "bc_right", ["band", "bhash"], 4)
    # disable broadcast (shuffle-free too, but proves nothing — the
    # original no-Exchange test's rationale)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "bc_left", "bc_right", ["band", "bhash"], ["band", "bhash"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
        import pytest as pt

        with pt.raises(ValueError, match="arity"):
            bucketed_join(spark, "bc_left", "bc_right", ["band", "bhash"], "band")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bc_left", "bc_right"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_register_bucketed_quotes_path_and_identifiers(spark, sf_dir, tmp_path):
    """r14 code-review: a path containing a single quote (legal POSIX) and
    a reserved-word-ish table name must survive the generated DDL."""
    from tranquility_spark.sources.bucketed import register_bucketed, write_bucketed
    from tranquility_spark.sources.files import load_table

    path = str(tmp_path / "o'brien-idx")
    spark.sql("DROP TABLE IF EXISTS `table`")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id").limit(100)
    write_bucketed(ev, "table", "user_id", 2, path=path)
    n = spark.table("`table`").count()
    # forget the registration (files survive — EXTERNAL), re-register
    spark.sql("DROP TABLE `table`")
    register_bucketed(
        spark, "table", "event_id BIGINT, user_id BIGINT", ["user_id"], 2, path
    )
    try:
        assert spark.table("`table`").count() == n > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS `table`")


def test_bucketed_dhash_served_pairs_zero_corpus_shuffle(spark, sf_dir):
    """dd23's serving claim, plan-asserted (r15, VERDICT r14 #3) — the
    dd19 test's shape on the IMAGE digest family: full pair extraction
    from the persisted bucketed dHash index has no corpus-side shuffle,
    no Python eval node (no image decode or perceptual-hash UDF at query
    time — the one pass that made dd16 expensive per run), and the served
    output equals the inline re-decode pipeline."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.dedup import (
        dhash_index_write,
        dhash_neardup_pairs,
        dhash_pairs_from_index,
    )
    from tranquility_spark.operators.multimodal import (
        attach_binary_payload,
        image_dhash,
    )
    from tranquility_spark.sources.files import load_table

    spark.sql("DROP TABLE IF EXISTS b_dhash_served")
    try:
        docs = load_table(spark, sf_dir, "documents")
        hashes = image_dhash(attach_binary_payload(docs))
        dhash_index_write(hashes, "b_dhash_served", num_buckets=4)
        idx = spark.table("b_dhash_served")

        # candidate stage under forced SortMergeJoin: ZERO exchanges
        ds = idx.select("sighex", "band", "bval").distinct()
        cand = ds.alias("a").join(
            ds.alias("b"),
            (FF.col("a.band") == FF.col("b.band"))
            & (FF.col("a.bval") == FF.col("b.bval"))
            & (FF.col("a.sighex") <= FF.col("b.sighex")),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = cand._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange") == 0, plan
            assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # full serving plan under defaults: exactly one shuffle (the
        # hash-pair dropDuplicates) and no Python eval node — nothing
        # re-decodes or re-hashes an image at query time
        pairs = dhash_pairs_from_index(idx, threshold=3)
        full = pairs._jdf.queryExecution().executedPlan().toString()
        assert full.count("Exchange hashpartitioning") == 1, full
        assert "BatchEvalPython" not in full and "ArrowEvalPython" not in full

        got = sorted(map(tuple, pairs.collect()))
        want = sorted(
            map(tuple, dhash_neardup_pairs(hashes, threshold=3).collect())
        )
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS b_dhash_served")


def test_bucketed_video_served_pairs_zero_corpus_shuffle(spark, sf_dir):
    """dd29's serving claim, plan-asserted (the dd23 test's shape on the
    VIDEO family, whose index is (id, fhash) bucketed on the single probe
    key): the inverted-index candidate self-join runs with ZERO exchanges
    over co-located buckets, the full serving plan has no Python eval
    node (no demux / frame-hash UDF at query time — the pass that makes
    video THE most decode-dominated family), and the served output
    equals the inline re-demux pipeline."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.dedup import (
        video_index_write,
        video_neardup_pairs,
        video_pairs_from_index,
    )
    from tranquility_spark.operators.multimodal import (
        attach_binary_payload,
        video_frame_hashes,
    )
    from tranquility_spark.sources.files import load_table

    spark.sql("DROP TABLE IF EXISTS b_video_served")
    try:
        docs = load_table(spark, sf_dir, "documents")
        fps = video_frame_hashes(attach_binary_payload(docs))
        video_index_write(fps, "b_video_served", num_buckets=4)
        idx = spark.table("b_video_served")

        # candidate stage under forced SortMergeJoin: ZERO exchanges —
        # the bucketed-on-fhash layout co-locates both join sides
        cand = idx.alias("a").join(
            idx.alias("b"),
            (FF.col("a.fhash") == FF.col("b.fhash"))
            & (FF.col("a.id") < FF.col("b.id")),
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = cand._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange") == 0, plan
            assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # full serving plan: no Python eval node — nothing re-demuxes or
        # re-hashes a frame at query time (pair/count aggregations DO
        # shuffle, but over ~24-byte index rows, not corpus bytes)
        pairs = video_pairs_from_index(idx, min_shared=2)
        full = pairs._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in full and "ArrowEvalPython" not in full

        got = sorted(map(tuple, pairs.collect()))
        want = sorted(
            map(tuple, video_neardup_pairs(fps, min_shared=2).collect())
        )
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS b_video_served")


def test_bucketed_content_hash_exact_gate_no_exchange(spark, sf_dir):
    """pipe8's served exact gate, plan-asserted (r16): with the
    content-hash index bucketed+sorted on h, the exact-dedup
    groupBy(h) aggregates in place — ZERO Exchange in the plan — and
    the gate's keep-min output equals the inline content_hash scan."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.dedup import content_hash
    from tranquility_spark.sources.bucketed import write_bucketed
    from tranquility_spark.sources.files import load_table

    spark.sql("DROP TABLE IF EXISTS b_cxhash")
    try:
        docs = load_table(spark, sf_dir, "documents")
        write_bucketed(
            docs.select(
                FF.col("doc_id").alias("id"),
                content_hash(FF.col("text")).alias("h"),
            ),
            "b_cxhash",
            ["h"],
            4,
        )
        idx = spark.table("b_cxhash")
        keep = idx.groupBy("h").agg(FF.min("id").alias("keep"))
        plan = keep._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        served = {(r["h"], r["keep"]) for r in keep.collect()}
        inline = {
            (r["h"], r["keep"])
            for r in docs.select(
                content_hash(FF.col("text")).alias("h"), "doc_id"
            )
            .groupBy("h")
            .agg(FF.min("doc_id").alias("keep"))
            .collect()
        }
        assert served == inline and served
    finally:
        spark.sql("DROP TABLE IF EXISTS b_cxhash")
