"""Range-clustered layout (sources/clustered.py, r14): the Druid
single_dim/range secondary-partitioning analog. The contract under test:

1. a clustered read under a range predicate is row-identical to the same
   predicate over the raw frame (layout round trip — the dq21 oracle
   certifies the same thing end-to-end via DuckDB);
2. the layout's parquet footers carry tight near-disjoint min/max per
   file, so a selective range structurally CANNOT touch most files — we
   assert skip-ability from metadata, not wall-clock (SCALE.md r14 holds
   the measured number at 10M rows);
3. the range predicate reaches the scan (PushedFilters) — the skip is the
   reader's, not a post-scan Filter's;
4. NULLs in the cluster column survive the layout, are never returned by
   a range read, and are visible to unfiltered reads (quarantine parity
   with spatial.py's NULL-cell rule).
"""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from tranquility_spark.sources.clustered import (
    files_overlapping,
    range_stats,
    read_range_clustered,
    write_range_clustered,
)
from tranquility_spark.sources.files import load_table


def _norm(rows):
    return sorted((r.event_id, r.user_id) for r in rows)


def test_clustered_read_matches_raw_filter(spark, sf_dir, tmp_path):
    path = str(tmp_path / "layout")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    write_range_clustered(ev, path, "user_id", n_files=4)

    pred = (F.col("user_id") >= 3) & (F.col("user_id") < 12)
    got = read_range_clustered(spark, path, pred).collect()
    want = ev.filter(pred).collect()
    assert _norm(got) == _norm(want) and len(got) > 0


def test_footer_stats_prove_skipability(spark, sf_dir, tmp_path):
    path = str(tmp_path / "layout")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    write_range_clustered(ev, path, "user_id", n_files=4)

    stats = range_stats(path, "user_id")
    assert len(stats) == 4 and all(mn is not None for (_, mn, _, _) in stats)
    # near-disjoint: sorted by min, each file's min must be >= the
    # previous file's max (range partitioning puts equal keys in one
    # partition, so strict disjointness holds for distinct boundaries)
    ordered = sorted(stats, key=lambda s: s[1])
    for (_, _, prev_max, _), (_, cur_min, _, _) in zip(ordered, ordered[1:]):
        assert cur_min >= prev_max
    # the sf0.001 domain is 0..14 over 4 files (~4 ids/file): a 2-id range
    # must structurally touch at most 2 of the 4
    touched = files_overlapping(stats, 5, 7)
    assert 1 <= len(touched) <= 2
    # and the reader agrees: every row the pruned read returns comes from
    # a file the footer test admits
    hit_files = {
        os.path.basename(r.f)
        for r in read_range_clustered(
            spark, path, (F.col("user_id") >= 5) & (F.col("user_id") < 7)
        )
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert hit_files <= set(touched)


def test_range_predicate_is_pushed(spark, sf_dir, tmp_path):
    path = str(tmp_path / "layout")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    write_range_clustered(ev, path, "user_id", n_files=4)

    plan = (
        read_range_clustered(
            spark, path, (F.col("user_id") >= 3) & (F.col("user_id") < 12)
        )
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(user_id,3)" in plan and "LessThan(user_id,12)" in plan


def test_nulls_quarantined_from_range_reads(spark, tmp_path):
    path = str(tmp_path / "layout")
    df = spark.createDataFrame(
        [Row(event_id=i, user_id=(None if i % 5 == 0 else i % 10)) for i in range(50)]
    )
    write_range_clustered(df, path, "user_id", n_files=3)

    pred = (F.col("user_id") >= 0) & (F.col("user_id") < 100)
    got = read_range_clustered(spark, path, pred)
    assert got.filter(F.col("user_id").isNull()).count() == 0
    assert got.count() == 40
    # unfiltered read still sees the NULL rows (nothing lost in layout)
    assert spark.read.parquet(path).count() == 50
    # and the footer inventory accounts for them
    assert sum(nulls for (_, _, _, nulls) in range_stats(path, "user_id")) == 10


def test_multi_column_clustering_sorts_within_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "layout")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    write_range_clustered(ev, path, ["user_id", "ts"], n_files=4)
    # rows inside each file are sorted on the leading column — tight row
    # group stats depend on it; verify per-file monotonicity directly
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        vals = [
            r.user_id
            for r in spark.read.parquet(os.path.join(path, name))
            .select("user_id")
            .collect()
        ]
        assert vals == sorted(vals)


def _sorted_runs(spark, path_or_file, col="user_id"):
    vals = [r[0] for r in spark.read.parquet(path_or_file).select(col).collect()]
    return vals == sorted(vals)


def test_sink_cluster_by_sorts_batches_and_compaction(spark, tmp_path):
    """SegmentSink(cluster_by=...) = Druid's range partitionsSpec at ingest:
    every micro-batch file is sorted on the cluster column, compaction
    collapses a closed bucket's sorted runs into one sorted file, and the
    committed snapshot is row-identical throughout."""
    import datetime as dt

    from tranquility_spark.streaming.sink import SegmentSink, compact

    sink = SegmentSink(
        str(tmp_path / "seg"), "wiki", "HOUR", cluster_by=["user_id"]
    )
    base = dt.datetime(2024, 6, 1, 11, 0)
    for b in range(3):
        rows = [
            (base + dt.timedelta(minutes=m % 50), (b * 17 + m * 31) % 100, float(m))
            for m in range(60)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, user_id long, v double")
        assert sink.write_batch(df, batch_id=b + 1) == 60

    seg = os.path.join(str(tmp_path / "seg"), "ds=wiki", "g=2024-06-01-11-00", "p=0")
    batch_files = [f for f in os.listdir(seg) if f.startswith("batch-")]
    assert len(batch_files) == 3
    for f in batch_files:
        assert _sorted_runs(spark, os.path.join(seg, f)), f"unsorted batch file {f}"

    before = sink.read(spark, committed_only=True).collect()
    assert compact(sink, spark) == 1
    after = sink.read(spark, committed_only=True).collect()
    key = lambda r: (r.ts, r.user_id, r.v)  # noqa: E731
    assert sorted(before, key=key) == sorted(after, key=key)

    compact_files = [f for f in os.listdir(seg) if f.startswith("compact-")]
    assert len(compact_files) == 1
    assert _sorted_runs(spark, os.path.join(seg, compact_files[0]))
    # the closed bucket's footer stats are now bucket-wide and tight
    stats = range_stats(seg, "user_id")
    assert [s for s in stats if "compact-" in s[0]][0][1:3] == (0, 99)
    # re-run stays a no-op (the clustered sort must not break convergence)
    assert compact(sink, spark) == 0


def test_sink_clustered_layout_prunes_on_committed_read(spark, tmp_path):
    """Closure of the ingest-to-serving loop: the layout the clustered sink
    (+ compaction) maintains is consumable by a plain committed-snapshot
    read — the range predicate reaches the parquet scan (PushedFilters),
    where the sorted files' footer stats make it a row-group skip."""
    import datetime as dt

    from tranquility_spark.streaming.sink import SegmentSink, compact

    sink = SegmentSink(
        str(tmp_path / "seg"), "wiki", "HOUR", cluster_by=["user_id"]
    )
    base = dt.datetime(2024, 6, 1, 11, 0)
    for b in range(2):
        rows = [
            (base + dt.timedelta(minutes=m % 50), (b * 13 + m * 7) % 100, float(m))
            for m in range(40)
        ]
        sink.write_batch(
            spark.createDataFrame(rows, "ts timestamp, user_id long, v double"),
            batch_id=b + 1,
        )
    compact(sink, spark)

    got = sink.read(spark, committed_only=True).filter(
        (F.col("user_id") >= 10) & (F.col("user_id") < 20)
    )
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "GreaterThanOrEqual(user_id,10)" in plan and "LessThan(user_id,20)" in plan
    want = [
        r
        for r in sink.read(spark, committed_only=True).collect()
        if 10 <= r.user_id < 20
    ]
    assert sorted((r.ts, r.user_id, r.v) for r in got.collect()) == sorted(
        (r.ts, r.user_id, r.v) for r in want
    )


def test_sink_cluster_by_streaming_e2e(spark, tmp_path):
    """cluster_by through the REAL streaming wiring (foreachBatch +
    availableNow), not just direct write_batch calls: per-batch files come
    out sorted, the committed snapshot matches the source rows, and
    compaction of the closed bucket yields one bucket-wide sorted file."""
    import datetime as dt
    import json

    from tranquility_spark.streaming.sink import SegmentSink, compact

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {
            "ts": f"2024-06-01T11:{m:02d}:00",
            "user_id": (m * 37) % 50,
            "v": float(m),
        }
        for m in range(30)
    ]
    # two source files → (at least) two micro-batches under availableNow
    # with maxFilesPerTrigger=1
    with open(src / "a.json", "w") as f:
        for e in rows[:15]:
            f.write(json.dumps(e) + "\n")
    with open(src / "b.json", "w") as f:
        for e in rows[15:]:
            f.write(json.dumps(e) + "\n")

    stream = (
        spark.readStream.schema("ts string, user_id long, v double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    from pyspark.sql import functions as SF

    stream = stream.withColumn("ts", SF.to_timestamp("ts"))
    sink = SegmentSink(
        str(tmp_path / "seg"), "wiki", "HOUR", cluster_by=["user_id"]
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    seg = os.path.join(str(tmp_path / "seg"), "ds=wiki", "g=2024-06-01-11-00", "p=0")
    batch_files = [f for f in os.listdir(seg) if f.startswith("batch-")]
    assert len(batch_files) >= 2
    for f in batch_files:
        assert _sorted_runs(spark, os.path.join(seg, f)), f"unsorted {f}"

    got = sink.read(spark, committed_only=True)
    assert sorted((r.user_id, r.v) for r in got.collect()) == sorted(
        (e["user_id"], e["v"]) for e in rows
    )
    assert compact(sink, spark) == 1
    compact_files = [f for f in os.listdir(seg) if f.startswith("compact-")]
    assert len(compact_files) == 1
    assert _sorted_runs(spark, os.path.join(seg, compact_files[0]))


def test_sink_cluster_by_missing_column_is_loud(spark, tmp_path):
    import datetime as dt

    import pytest

    from tranquility_spark.streaming.sink import SegmentSink, compact

    df = spark.createDataFrame(
        [(dt.datetime(2024, 6, 1, 11, 5), "a")], "ts timestamp, page string"
    )
    clustered = SegmentSink(
        str(tmp_path / "seg"), "wiki", "HOUR", cluster_by=["user_id"]
    )
    with pytest.raises(ValueError, match="cluster_by columns missing"):
        clustered.write_batch(df, batch_id=1)
    # legacy layout written WITHOUT clustering, then compacted by a sink
    # that declares it: the maintenance path must be equally loud
    plain = SegmentSink(str(tmp_path / "seg"), "wiki", "HOUR")
    plain.write_batch(df, batch_id=1)
    plain.write_batch(df, batch_id=2)
    with pytest.raises(ValueError, match="cluster_by columns missing"):
        compact(clustered, spark)


def test_files_overlapping_covering_property_fuzz(spark, tmp_path):
    """The footer-admitted file set must be a SUPERSET of the files that
    actually contain matching rows, for arbitrary ranges — including the
    r14 code-review edge: an ALL-NULL file writes no min/max by design
    and must be excluded (no range matches NULL), while a genuinely
    unbounded file must always be admitted. Hypothesis fuzzes the ranges
    against one fixed layout (writing parquet per example would dominate
    the test)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    path = str(tmp_path / "layout")
    rows = [(i, v) for i, v in enumerate([None] * 40 + list(range(-50, 300, 3)))]
    df = spark.createDataFrame(rows, "rid long, user_id long")
    write_range_clustered(df, path, "user_id", n_files=5)
    stats = range_stats(path, "user_id")
    # ground truth: which files really hold rows in [lo, hi)
    by_file = {}
    for name, _mn, _mx, _nulls in stats:
        by_file[name] = [
            r.user_id
            for r in spark.read.parquet(os.path.join(path, name)).collect()
            if r.user_id is not None
        ]

    @settings(max_examples=200, deadline=None)
    @given(
        lo=st.integers(min_value=-200, max_value=400),
        span=st.integers(min_value=0, max_value=300),
    )
    def check(lo, span):
        hi = lo + span
        admitted = set(files_overlapping(stats, lo, hi))
        actual = {f for f, vals in by_file.items() if any(lo <= v < hi for v in vals)}
        assert actual <= admitted, (lo, hi, actual - admitted)

    check()
    # the NULL rows all landed somewhere; the inventory accounts for them
    assert sum(n for (_, _, _, n) in stats if n > 0) == 40


def test_dq21_entry_reuses_persisted_layout(spark, sf_dir):
    from tranquility_spark.catalog import CATALOG

    fn = CATALOG["dq21_range_clustered_scan"].fn
    first = fn(spark, sf_dir).collect()
    # locate the layout the entry just built and pin its write time
    from tranquility_spark.catalog_llm import (
        _index_cache_digest,
        _index_cache_key,
        _index_cache_root,
    )

    layout = os.path.join(
        _index_cache_root(),
        "rangelayout-"
        + _index_cache_digest(
            "rangelayout-user_id-n8-v2", _index_cache_key(sf_dir, table="events")
        ),
    )
    marker = os.path.join(layout, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    second = fn(spark, sf_dir).collect()
    assert os.path.getmtime(marker) == mtime, "entry rewrote a cached layout"
    key = lambda r: r.event_type  # noqa: E731
    assert sorted(first, key=key) == sorted(second, key=key)
