"""KMV/theta sketch: accuracy bounds, exact mergeability, set-op estimates.

These are the quantitative quality bounds for the rows-only entries
a11c_theta_setops_approx / a11d_sketch_merge_rollup (VERDICT round-2 ask #3/#4
pattern: every no_oracle entry cites a numeric test against an exact twin).
"""

import math

import pyspark.sql.functions as F
import pytest

from tranquility_spark.catalog import CATALOG
from tranquility_spark.operators.sketch import kmv_merge, kmv_sketch, theta_set_ops


def _ids(spark, lo, hi, label):
    return spark.range(lo, hi).select(
        F.lit(label).alias("grp"), F.concat(F.lit("id_"), F.col("id")).alias("v")
    )


def test_kmv_exact_below_k(spark):
    # groups with < k distinct values are EXACT (theta == 1)
    df = _ids(spark, 0, 100, "a")
    row = kmv_sketch(df, ["grp"], "v", k=256).collect()[0]
    assert row["theta"] == 1.0
    assert row["est"] == 100.0
    assert len(row["kmv"]) == 100


def test_kmv_accuracy_above_k(spark):
    # 20k distinct values, k=256 → RSE ≈ 1/sqrt(254) ≈ 6.3%; deterministic
    # (seedless xxhash64), assert within 4·RSE = 25%
    n, k = 20_000, 256
    df = _ids(spark, 0, n, "a")
    row = kmv_sketch(df, ["grp"], "v", k=k).collect()[0]
    rse = 1.0 / math.sqrt(k - 2)
    assert abs(row["est"] - n) / n < 4 * rse
    assert len(row["kmv"]) == k
    assert row["theta"] == row["kmv"][k - 1]


def test_kmv_merge_identical_to_direct(spark):
    # the mergeability contract: per-part partial sketches merged == direct
    # sketch of the union, bit-for-bit (values, theta, estimate)
    n, k = 20_000, 128
    df = _ids(spark, 0, n, "a").withColumn("part", F.pmod(F.xxhash64("v"), F.lit(7)))
    direct = kmv_sketch(df, ["grp"], "v", k=k).collect()[0]
    partials = kmv_sketch(df, ["grp", "part"], "v", k=k)
    merged = kmv_merge(partials, ["grp"], k=k).collect()[0]
    assert merged["kmv"] == direct["kmv"]
    assert merged["theta"] == direct["theta"]
    assert merged["est"] == direct["est"]


def test_kmv_merge_single_saturated_partial_is_identity(spark):
    # adversarial boundary case: one saturated partial (theta == its k-th
    # retained hash) merged alone must reproduce itself bit-for-bit — a
    # strict < filter against min(theta) drops the boundary hash (the k-th
    # value IS theta) leaving k-1 values and a wrong theta/estimate
    n, k = 5_000, 64
    partial = kmv_sketch(_ids(spark, 0, n, "a"), ["grp"], "v", k=k)
    direct = partial.collect()[0]
    assert direct["theta"] == direct["kmv"][k - 1]  # saturated precondition
    merged = kmv_merge(partial, ["grp"], k=k).collect()[0]
    assert merged["kmv"] == direct["kmv"]
    assert merged["theta"] == direct["theta"]
    assert merged["est"] == direct["est"]


def test_theta_set_ops_accuracy(spark):
    # A = [0, 10k), B = [6k, 16k): |A∩B| = 4k, |A∪B| = 16k, |A\B| = 6k
    k = 256
    a = kmv_sketch(_ids(spark, 0, 10_000, "a"), ["grp"], "v", k=k).drop("grp")
    b = kmv_sketch(_ids(spark, 6_000, 16_000, "b"), ["grp"], "v", k=k).drop("grp")
    row = theta_set_ops(a, b).collect()[0]
    rse = 1.0 / math.sqrt(k - 2)
    # union uses ~2k samples; intersection error scales with union size —
    # standard theta behavior, so give the intersection the union's absolute
    # error budget (4·RSE of |A∪B|)
    assert abs(row["union_est"] - 16_000) / 16_000 < 4 * rse
    assert abs(row["inter_est"] - 4_000) < 4 * rse * 16_000
    assert abs(row["a_only_est"] - 6_000) < 4 * rse * 16_000


def test_streaming_sketch_partials_merge_to_batch_sketch(spark, sf_dir, tmp_path):
    """Druid's ingest-time sketch story end-to-end: stream micro-batches →
    per-batch KMV partials through foreachBatch → kmv_merge at read time
    reproduces the batch sketch of the full stream bit-for-bit."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.sketch import sketch_partials_sink
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)  # 4 files → 4 micro-batches

    out = str(tmp_path / "partials")
    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            sketch_partials_sink(out, ["event_type"], "user_id", k=64)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() >= 2  # really streamed
    merged = {
        r["event_type"]: (r["kmv"], r["theta"], r["est"])
        for r in kmv_merge(partials, ["event_type"], k=64).collect()
    }
    direct = {
        r["event_type"]: (r["kmv"], r["theta"], r["est"])
        for r in kmv_sketch(ev, ["event_type"], "user_id", k=64).collect()
    }
    assert merged == direct
    # and the estimate tracks the exact distinct count
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(FF.countDistinct("user_id").alias("n")).collect()
    }
    for et, n in exact.items():
        assert abs(merged[et][2] - n) / n < 4 / math.sqrt(62)


def test_a11c_matches_exact_twin(spark, sf_dir):
    # on testdata the click/error user sets are below k → estimates EXACT
    approx = CATALOG["a11c_theta_setops_approx"].fn(spark, sf_dir).collect()[0]
    exact = CATALOG["a11b_distinct_set_ops"].fn(spark, sf_dir).collect()[0]
    assert approx["both_types_est"] == pytest.approx(exact["both_types"])
    assert approx["either_type_est"] == pytest.approx(exact["either_type"])
    assert approx["click_only_est"] == pytest.approx(exact["click_only"])


def test_a11d_matches_exact_distinct(spark, sf_dir):
    from tranquility_spark.sources.files import load_table

    got = {
        r["event_type"]: r["uniq_users_est"]
        for r in CATALOG["a11d_sketch_merge_rollup"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rse = 1.0 / math.sqrt(254)
    for et, n in exact.items():
        assert abs(got[et] - n) / n < 4 * rse


# ---------------------------------------------------------------------------
# Misra–Gries mergeable heavy hitters (the SpaceSaving twin of txt10)
# ---------------------------------------------------------------------------


def test_mg_partial_bounds(spark):
    """est <= true <= est + deduct for every reported item; any item with
    true count > N/(k+1) is guaranteed reported (classic MG bound)."""
    from tranquility_spark.operators.heavy_hitters import mg_partial

    # 100 'a', 50 'b', then 60 distinct singletons: N=210, k=4 -> N/(k+1)=42
    rows = [("g", "a")] * 100 + [("g", "b")] * 50 + [("g", f"z{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "grp string, v string")
    s = mg_partial(df, ["grp"], "v", k=4).collect()[0]
    true = {"a": 100, "b": 50, **{f"z{i}": 1 for i in range(60)}}
    assert s["n_total"] == 210
    assert s["deduct"] <= 210 / 5
    for item, est in s["counters"].items():
        assert est <= true[item] <= est + s["deduct"], item
    assert "a" in s["counters"] and "b" in s["counters"]  # true > N/(k+1)


def test_mg_merge_matches_bound_vs_exact(spark, sf_dir):
    """Per-source partials merged globally stay within the N/(k+1) bound
    against the exact token counts (txt10's groupBy), and every token
    frequent enough to be guaranteed is present."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.heavy_hitters import mg_merge, mg_partial
    from tranquility_spark.sources.files import load_table

    k = 64
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", FF.explode(FF.split(FF.trim(FF.col("text")), r"\s+")).alias("tok")
    ).withColumn("grp", FF.lit("all"))

    partials = mg_partial(toks, ["grp", "source"], "tok", k=k).drop("source")
    merged = mg_merge(partials, ["grp"], k=k).collect()[0]

    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(FF.count(FF.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    assert merged["n_total"] == n_total
    assert merged["deduct"] <= n_total / (k + 1)  # mergeability keeps the bound
    for item, est in merged["counters"].items():
        assert est <= exact[item] <= est + merged["deduct"], item
    for item, cnt in exact.items():
        if cnt > merged["deduct"]:
            assert item in merged["counters"], (item, cnt, merged["deduct"])


def test_streaming_hh_partials_merge(spark, sf_dir, tmp_path):
    """Stream micro-batches -> per-batch MG partials via foreachBatch ->
    mg_merge at read time answers top-K within the bound vs exact counts
    (user_id has more distinct values than k, so truncation really happens)."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.heavy_hitters import hh_partials_sink, mg_merge, mg_topk
    from tranquility_spark.sources.files import load_table

    k = 32
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    out = str(tmp_path / "hh_partials")
    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.withColumn("grp", FF.lit("all"))
        .writeStream.foreachBatch(hh_partials_sink(out, ["grp"], "user_id", k=k))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() >= 2
    merged_df = mg_merge(partials.drop("batch_id"), ["grp"], k=k)
    merged = merged_df.collect()[0]
    exact = {
        str(r["user_id"]): r["n"]
        for r in ev.groupBy("user_id").agg(FF.count(FF.lit(1)).alias("n")).collect()
    }
    assert merged["n_total"] == sum(exact.values())
    assert 0 < len(merged["counters"]) <= k
    for item, est in merged["counters"].items():
        assert est <= exact[item] <= est + merged["deduct"], item
    top = mg_topk(merged_df, ["grp"], topk=10).collect()
    assert len(top) <= 10 and all(t["err_ub"] == merged["deduct"] for t in top)


def test_quantile_sample_merge_identical_to_direct(spark):
    """Mergeability contract of the bottom-k row sample: per-part partials
    merged == direct sketch of the union, bit-for-bit (sample AND total)."""
    from tranquility_spark.operators.sketch import (
        quantile_sample_merge,
        quantile_sample_sketch,
    )

    n, k = 20_000, 128
    df = (
        spark.range(0, n)
        .select(
            F.lit("a").alias("grp"),
            F.col("id").alias("rid"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .withColumn("part", F.pmod(F.xxhash64("rid"), F.lit(7)))
    )
    direct = quantile_sample_sketch(df, ["grp"], "v", "rid", k=k).collect()[0]
    partials = quantile_sample_sketch(df, ["grp", "part"], "v", "rid", k=k)
    merged = quantile_sample_merge(partials, ["grp"], k=k).collect()[0]
    assert merged["sample"] == direct["sample"]
    assert merged["n_total"] == direct["n_total"] == n


def test_quantile_sample_merge_empty_sample_partial(spark):
    """ADVICE r8: a partial row with an EMPTY sample array must still
    contribute its n_total to the merged total (posexplode_outer, the
    mg_merge shape) without its NULL placeholder displacing genuine rows
    from bottom-k slots; a group whose partials are ALL empty survives
    with sample=[] and the summed total."""
    from tranquility_spark.operators.sketch import (
        quantile_sample_merge,
        quantile_sample_sketch,
    )

    df = spark.range(0, 500).select(
        F.lit("a").alias("grp"),
        F.col("id").alias("rid"),
        F.col("id").cast("double").alias("v"),
    )
    k = 64
    real = quantile_sample_sketch(df, ["grp"], "v", "rid", k=k)
    empties = spark.createDataFrame(
        [("a", 70), ("b", 11), ("b", 22)],
        "grp string, n_total long",
    ).select(
        "grp",
        "n_total",
        F.array().cast("array<struct<h:double,v:double>>").alias("sample"),
    )
    merged = {
        r["grp"]: r
        for r in quantile_sample_merge(
            real.unionByName(empties), ["grp"], k=k
        ).collect()
    }
    direct = real.collect()[0]
    # group a: empty partial adds 70 to the total, sample unchanged
    assert merged["a"]["n_total"] == direct["n_total"] + 70 == 570
    assert merged["a"]["sample"] == direct["sample"]
    # group b: all-empty partials survive with an empty sample
    assert merged["b"]["n_total"] == 33
    assert merged["b"]["sample"] == []


def test_quantile_sketch_rank_bounds_vs_exact(spark, sf_dir):
    """CLT rank bound: the estimated p50/p90 of events.value per event_type
    sits within 4*sqrt(q(1-q)/k) of the true quantile IN RANK SPACE."""
    import math

    from tranquility_spark.catalog import CATALOG
    from tranquility_spark.sources.files import load_table

    k = 256
    est = {
        r.event_type: r
        for r in CATALOG["a10c_quantile_sketch_merge"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    for q, col in ((0.5, "p50_est"), (0.9, "p90_est")):
        bound = 4 * math.sqrt(q * (1 - q) / k)
        for etype, row in est.items():
            vals = ev.filter(F.col("event_type") == etype).select(
                F.col("value").cast("double").alias("v")
            )
            n = vals.count()
            # realized rank of the estimate among the true values
            rank = vals.filter(F.col("v") <= row[col]).count() / n
            assert abs(rank - q) <= bound or n <= k, (etype, q, rank)


def test_quantile_sketch_exact_below_k(spark):
    """Groups that fit in k carry every row — quantiles are exact."""
    from tranquility_spark.operators.sketch import (
        quantile_estimates,
        quantile_sample_sketch,
    )

    df = spark.range(0, 100).select(
        F.lit("a").alias("grp"),
        F.col("id").alias("rid"),
        F.col("id").cast("double").alias("v"),
    )
    sk = quantile_sample_sketch(df, ["grp"], "v", "rid", k=256)
    row = quantile_estimates(sk, ["grp"], quantiles=(0.5, 0.9)).collect()[0]
    assert row["n_total"] == 100
    assert row["p50"] == 49.0  # rank ceil(0.5*100)=50 → value 49
    assert row["p90"] == 89.0


def test_streaming_quantile_partials_merge_to_batch_sketch(spark, sf_dir, tmp_path):
    """Quantile twin of the KMV streaming lifecycle: stream micro-batches →
    per-batch bottom-k sample partials via foreachBatch →
    quantile_sample_merge at read time reproduces the direct batch sample
    of the full stream bit-for-bit."""
    from tranquility_spark.operators.sketch import (
        quantile_partials_sink,
        quantile_sample_merge,
        quantile_sample_sketch,
    )
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", F.col("value").cast("double").alias("value")
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    out = str(tmp_path / "qpartials")
    stream = (
        spark.readStream.schema("event_type string, event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            quantile_partials_sink(out, ["event_type"], "value", "event_id", k=64)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() >= 2  # really streamed
    merged = {
        r["event_type"]: (r["sample"], r["n_total"])
        for r in quantile_sample_merge(partials, ["event_type"], k=64).collect()
    }
    direct = {
        r["event_type"]: (r["sample"], r["n_total"])
        for r in quantile_sample_sketch(ev, ["event_type"], "value", "event_id", k=64).collect()
    }
    assert merged == direct


def test_quantile_sample_merge_replayed_partial_is_identity(spark):
    """Replay contract (found in self-review): a partial appended TWICE
    (foreachBatch redelivery) must not displace genuine rows from the
    bottom-k — merge dedupes identical (h, v) rows, mirroring kmv_merge."""
    from tranquility_spark.operators.sketch import (
        quantile_sample_merge,
        quantile_sample_sketch,
    )

    n, k = 5_000, 64
    df = spark.range(0, n).select(
        F.lit("a").alias("grp"),
        F.col("id").alias("rid"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    partial = quantile_sample_sketch(df, ["grp"], "v", "rid", k=k)
    direct = partial.collect()[0]
    replayed = partial.unionByName(partial)  # the duplicated append
    merged = quantile_sample_merge(replayed, ["grp"], k=k).collect()[0]
    assert merged["sample"] == direct["sample"]
    # n_total is sum-based and DOES double under replay — documented: readers
    # must dedupe partials by (group, batch_id) for totals, or accept sample-
    # only queries; the sample itself is replay-safe
    assert merged["n_total"] == 2 * n


# ---------------------------------------------------------------------------
# Count-Min sketch (operators/cms.py, mergeable family #5)
# ---------------------------------------------------------------------------


def test_cms_estimate_ge_true_and_bounded(spark, sf_dir):
    """CMS hard guarantee: est >= true for EVERY key (counters only
    over-count); accuracy: mean over-count across keys stays within a small
    multiple of N/width (the expected single-row collision mass — min over
    depth rows only tightens it). Deterministic: xxhash64 is seedless."""
    from tranquility_spark.operators.cms import cms_counters, cms_estimate
    from tranquility_spark.sources.files import load_table

    width, depth = 512, 4
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counters = cms_counters(ev, "user_id", width=width, depth=depth)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    rows = cms_estimate(
        exact, counters, "user_id", width=width, depth=depth
    ).collect()
    n_total = sum(r["true_n"] for r in rows)
    assert rows and all(r["est_count"] >= r["true_n"] for r in rows)
    mean_over = sum(r["est_count"] - r["true_n"] for r in rows) / len(rows)
    assert mean_over <= 2.0 * n_total / width, (mean_over, n_total / width)
    # a never-inserted key still answers (0 unless it collides everywhere)
    ghost = spark.createDataFrame([(-987654321,)], "user_id long")
    g = cms_estimate(ghost, counters, "user_id", width=width, depth=depth)
    assert g.collect()[0]["est_count"] >= 0


def test_cms_estimate_join_equals_broadcast_estimate(spark, sf_dir):
    """The beyond-broadcast-fit join estimate returns EXACTLY the broadcast
    map estimate for every probe row — including never-inserted keys
    (absent cell = 0) and duplicate probe rows (each output row keeps its
    own estimate). Probe columns survive untouched."""
    from tranquility_spark.operators.cms import (
        cms_counters,
        cms_estimate,
        cms_estimate_join,
    )
    from tranquility_spark.sources.files import load_table

    width, depth = 512, 4
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counters = cms_counters(ev, "user_id", width=width, depth=depth)
    probes = (
        ev.distinct()
        .withColumn("tag", F.col("user_id") * 2)
        .unionByName(
            spark.createDataFrame(
                [(-987654321, 0), (-987654321, 0)], "user_id long, tag long"
            )
        )
    )
    kw = dict(width=width, depth=depth)
    via_map = sorted(
        map(tuple, cms_estimate(probes, counters, "user_id", **kw).collect())
    )
    via_join = sorted(
        map(tuple, cms_estimate_join(probes, counters, "user_id", **kw).collect())
    )
    assert via_map == via_join
    assert len(via_join) == probes.count()  # duplicates preserved


def test_cms_merge_identical_to_direct(spark, sf_dir):
    """Sum-merge of per-event-type partials == one direct build on the full
    stream, bit-for-bit (counter addition is associative/commutative) — the
    same exact-merge contract as KMV/MG/quantile/bloom partials."""
    from tranquility_spark.operators.cms import cms_counters, cms_merge
    from tranquility_spark.sources.files import load_table

    kw = dict(width=256, depth=4)
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    assert len(types) >= 2
    partials = [
        cms_counters(
            ev.filter(F.col("event_type") == t).select("user_id"), "user_id", **kw
        )
        for t in types
    ]
    merged = sorted(
        tuple(r) for r in cms_merge(partials).collect()
    )
    direct = sorted(
        tuple(r)
        for r in cms_counters(ev.select("user_id"), "user_id", **kw).collect()
    )
    assert merged == direct


def test_cms_weighted_build(spark):
    """weight_col: inserting (key, w) adds w to each cell — the weighted
    estimate dominates the true weighted sum exactly as the unweighted one
    dominates counts."""
    from tranquility_spark.operators.cms import cms_counters, cms_estimate

    df = spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7), (3, 1)], "k long, w long"
    )
    counters = cms_counters(df, "k", width=64, depth=3, weight_col="w")
    probes = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got = {
        r["k"]: r["est_count"]
        for r in cms_estimate(probes, counters, "k", width=64, depth=3).collect()
    }
    assert got[1] >= 15 and got[2] >= 7 and got[3] >= 1


def test_streaming_cms_partials_merge(spark, sf_dir, tmp_path):
    """Stream micro-batches -> per-batch counter-table partials via
    foreachBatch -> cms_merge_read reconstructs the lifetime sketch
    BIT-identical to the one-shot batch build (sum-merge exactness), and the
    point estimates from the merged sketch equal the direct build's."""
    from tranquility_spark.operators.cms import (
        cms_counters,
        cms_estimate,
        cms_merge_read,
        cms_partials_sink,
    )
    from tranquility_spark.sources.files import load_table

    width, depth = 256, 4
    ev = load_table(spark, sf_dir, "events").select("user_id")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    out = str(tmp_path / "cms_partials")
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            cms_partials_sink(out, "user_id", width=width, depth=depth)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    raw = spark.read.parquet(out)
    assert raw.select("batch_id").distinct().count() >= 2  # really streamed
    merged = cms_merge_read(spark, out)
    direct = cms_counters(ev, "user_id", width=width, depth=depth)
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )
    probes = ev.distinct()
    est_m = {
        r["user_id"]: r["est_count"]
        for r in cms_estimate(probes, merged, "user_id", width=width, depth=depth).collect()
    }
    est_d = {
        r["user_id"]: r["est_count"]
        for r in cms_estimate(probes, direct, "user_id", width=width, depth=depth).collect()
    }
    assert est_m == est_d


def test_cms_estimate_probe_side_never_shuffles(spark, sf_dir):
    """The estimate plan must contain NO Exchange on the probe frame — the
    counter table folds to a broadcast map (bloom_probe's plan contract)."""
    from tranquility_spark.operators.cms import cms_counters, cms_estimate
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    counters = cms_counters(ev, "user_id", width=256, depth=4)
    # materialize the (bounded) counter table so its build shuffle does not
    # appear in the probe plan under inspection
    frozen = spark.createDataFrame(
        counters.collect(), "row_idx int, col_idx long, cnt long"
    )
    plan = cms_estimate(
        ev, frozen, "user_id", width=256, depth=4
    )._jdf.queryExecution().executedPlan().toString()
    probe_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_side, probe_side


# ---------------------------------------------------------------------------
# Native Datasketches HLL (operators/hll.py, mergeable family #6)
# ---------------------------------------------------------------------------


def test_hll_merge_estimate_equals_direct(spark, sf_dir):
    """Merging per-day partials must estimate EXACTLY what a direct
    whole-corpus sketch estimates AT THIS FIXTURE'S SCALE (sketches stay
    sparse; registers are per-slot maxima), and both track exact
    countDistinct within 5% (lgk=12 RSE ~1.6%). Scope caveat found by
    a6c2's strict-equality first draft (r11): past the dense transition
    (sf0.1 cardinalities) the union's register state can differ from a
    direct build's by ~0.5% — the general contract is the a6c2 tracking
    bound, not equality."""
    from tranquility_spark.operators.hll import (
        hll_estimates,
        hll_merge,
        hll_partials,
    )
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    direct = {
        r["event_type"]: r["distinct_est"]
        for r in hll_estimates(
            hll_partials(ev, ["event_type"], "user_id")
        ).collect()
    }
    partials = hll_partials(ev, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["distinct_est"]
        for r in hll_estimates(
            hll_merge(partials.drop("day"), ["event_type"])
        ).collect()
    }
    assert merged == direct
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(merged) == set(exact)
    for t, est in merged.items():
        assert abs(est - exact[t]) <= 0.05 * exact[t], (t, est, exact[t])


def test_hll_union_replay_idempotent(spark, sf_dir):
    """A duplicated partial (foreachBatch redelivery) cannot change any
    estimate: union is register-max, so re-unioning identical state is a
    no-op — the bloom-OR argument, unlike CMS's sum."""
    from tranquility_spark.operators.hll import (
        hll_estimates,
        hll_merge,
        hll_partials,
    )
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events")
    partials = hll_partials(ev, ["event_type"], "user_id")
    once = {
        r["event_type"]: r["distinct_est"]
        for r in hll_estimates(hll_merge(partials, ["event_type"])).collect()
    }
    replayed = partials.unionByName(partials)
    twice = {
        r["event_type"]: r["distinct_est"]
        for r in hll_estimates(hll_merge(replayed, ["event_type"])).collect()
    }
    assert once == twice


def test_streaming_hll_partials_merge(spark, sf_dir, tmp_path):
    """Stream micro-batches -> per-batch HLL partials via foreachBatch ->
    hll_merge_read estimates equal the one-shot batch build's estimates."""
    from tranquility_spark.operators.hll import (
        hll_estimates,
        hll_merge_read,
        hll_partials,
        hll_partials_sink,
    )
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    out = str(tmp_path / "hll_partials")
    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            hll_partials_sink(out, ["event_type"], "user_id")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    raw = spark.read.parquet(out)
    assert raw.select("batch_id").distinct().count() >= 2  # really streamed
    merged = {
        r["event_type"]: r["distinct_est"]
        for r in hll_estimates(
            hll_merge_read(spark, out, ["event_type"])
        ).collect()
    }
    direct = {
        r["event_type"]: r["distinct_est"]
        for r in hll_estimates(
            hll_partials(ev, ["event_type"], "user_id")
        ).collect()
    }
    assert merged == direct


# ---------------------------------------------------------------------------
# Native Datasketches theta + KLL (Spark 4.1 built-ins)
# ---------------------------------------------------------------------------


def test_a11e_native_theta_matches_exact_twin(spark, sf_dir):
    """Native theta set-op estimates track the exact twin a11b within 4x the
    default-k RSE, and the entry is DETERMINISTIC across reruns (theta state
    is the k smallest hashes — order-independent), unlike KLL below."""
    from tranquility_spark.catalog import CATALOG

    r1 = CATALOG["a11e_theta_native"].fn(spark, sf_dir).collect()[0]
    r2 = CATALOG["a11e_theta_native"].fn(spark, sf_dir).collect()[0]
    assert tuple(r1) == tuple(r2)  # rerun-stable
    exact = CATALOG["a11b_distinct_set_ops"].fn(spark, sf_dir).collect()[0]
    tol = 4 * 1.04 / (4096 - 2) ** 0.5  # 4x RSE at default k=4096
    union_true = exact["either_type"]
    assert abs(r1["either_type_est"] - union_true) <= tol * union_true
    assert abs(r1["both_types_est"] - exact["both_types"]) <= tol * union_true
    assert abs(r1["click_only_est"] - exact["click_only"]) <= tol * union_true


def test_native_theta_union_agg_merge_estimate_stable(spark, sf_dir):
    """theta_union_agg over per-day partials estimates what the direct
    whole-corpus sketch estimates (k-smallest-hash state is
    order/partition-independent)."""
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    direct = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
        .select("event_type", F.theta_sketch_estimate("sk").alias("e"))
        .collect()
    }
    merged = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type", "day")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.theta_union_agg("sk").alias("sk"))
        .select("event_type", F.theta_sketch_estimate("sk").alias("e"))
        .collect()
    }
    assert merged == direct


def test_native_kll_quantiles_bounded_but_nondeterministic(spark, sf_dir):
    """Spark's native KLL quantile sketch: p50/p90 from both a direct build
    AND a merged per-day build land within the ~1.5% rank-error envelope of
    the exact quantiles, and n is preserved exactly. KLL compaction is
    RANDOMIZED AND UNSEEDED (documented here by construction: this test
    only asserts bounds, never value equality across runs) — which is why
    KLL has no catalog entry: the catalog's rows-only policy requires
    rerun-deterministic values (a6c/a11e satisfy it; KLL cannot)."""
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v"),
        F.to_date("ts").alias("day"),
    )
    exact = {
        r["event_type"]: (r["p50"], r["p90"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.9)").alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    spread = {
        t: (
            ev.filter(F.col("event_type") == t)
            .agg(F.max("v") - F.min("v"))
            .collect()[0][0]
        )
        for t in exact
    }

    def check(rows):
        got = {
            r["event_type"]: (r["p50"], r["p90"], r["n"]) for r in rows
        }
        assert set(got) == set(exact)
        for t, (p50, p90, n) in got.items():
            assert n == exact[t][2]  # n is exact, never sampled away
            # rank-error epsilon ~1.7% at default k=200; values are data
            # points, so value error <= epsilon * local spread (generous:
            # full spread)
            assert abs(p50 - exact[t][0]) <= 0.05 * spread[t] + 1e-9
            assert abs(p90 - exact[t][1]) <= 0.05 * spread[t] + 1e-9

    direct = (
        ev.groupBy("event_type")
        .agg(F.kll_sketch_agg_double("v").alias("sk"))
        .select(
            "event_type",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
            F.kll_sketch_get_n_double("sk").alias("n"),
        )
        .collect()
    )
    check(direct)
    merged = (
        ev.groupBy("event_type", "day")
        .agg(F.kll_sketch_agg_double("v").alias("sk"))
        .groupBy("event_type")
        .agg(F.kll_merge_agg_double("sk").alias("sk"))
        .select(
            "event_type",
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
            F.kll_sketch_get_n_double("sk").alias("n"),
        )
        .collect()
    )
    check(merged)


def test_dkll_deterministic_and_partition_invariant(spark, sf_dir):
    """The deterministic KLL (operators/kll.py): two builds over DIFFERENT
    physical partitionings/orderings of the same data produce bit-identical
    summary rows — the property the native KLL cannot offer (see the test
    above) and the reason dKLL gets a catalog entry."""
    from tranquility_spark.operators.kll import kll_partial
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    a = sorted(
        map(tuple, kll_partial(ev.repartition(7), ["event_type"], "v").collect())
    )
    b = sorted(
        map(
            tuple,
            kll_partial(
                ev.repartition(3).sortWithinPartitions(F.desc("v")),
                ["event_type"],
                "v",
            ).collect(),
        )
    )
    assert a == b and a


def test_dkll_rank_error_envelope_direct_and_merged(spark, sf_dir):
    """Measured rank-error envelope for the deterministic sketch, direct
    AND per-day-merged: every reported quantile's TRUE normalized rank sits
    within 5% of the target, n is exact, and the summary's total weight
    equals n (weight conservation — nothing lost in compaction)."""
    from tranquility_spark.operators.kll import kll_merge, kll_partial, kll_quantiles
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.to_date("ts").cast("string").alias("day"),
    )
    truth = {
        t: sorted(
            r["v"] for r in ev.filter(F.col("event_type") == t).collect()
        )
        for t in [r[0] for r in ev.select("event_type").distinct().collect()]
    }

    def check(est_rows):
        assert {r["event_type"] for r in est_rows} == set(truth)
        for r in est_rows:
            vals = truth[r["event_type"]]
            assert r["n_total"] == len(vals)
            for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
                import bisect

                # estimate's true normalized rank (upper rank of the value)
                rank = bisect.bisect_right(vals, r[col]) / len(vals)
                assert abs(rank - q) <= 0.05, (r["event_type"], col, rank)

    direct = kll_partial(ev, ["event_type"], "v")
    # weight conservation on the summary itself
    wsum = {
        r["event_type"]: (r["w"], r["n"])
        for r in direct.groupBy("event_type")
        .agg(
            F.sum(F.pow(F.lit(2.0), F.col("level")).cast("long")).alias("w"),
            F.max("n_total").alias("n"),
        )
        .collect()
    }
    assert all(w == n for w, n in wsum.values())
    check(kll_quantiles(direct, ["event_type"]).collect())

    per_day = kll_partial(ev, ["event_type", "day"], "v").withColumnRenamed(
        "day", "pid"
    )
    merged = kll_merge(per_day, ["event_type"], "pid")
    check(kll_quantiles(merged, ["event_type"]).collect())
    # merge determinism: running it again is bit-identical
    m1 = sorted(map(tuple, merged.collect()))
    m2 = sorted(map(tuple, kll_merge(per_day, ["event_type"], "pid").collect()))
    assert m1 == m2


def test_dkll_small_groups_exact_and_merge_double_counts(spark):
    """A group that never overflows k reports EXACT quantiles (no
    compaction happened); and merging a duplicated partial double-counts
    (the documented CMS-style non-idempotence — batch_id= partitions are
    the safety mechanism, not reader-side dedupe)."""
    from tranquility_spark.operators.kll import kll_merge, kll_partial, kll_quantiles

    rows = [("g", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "grp string, v double")
    sk = kll_partial(df, ["grp"], "v", k=128)
    # k=128 > 100 values: level 0 holds every value exactly
    assert sk.filter(F.col("level") > 0).count() == 0
    est = kll_quantiles(sk, ["grp"]).collect()[0]
    assert (est["p50"], est["p90"], est["p99"]) == (50.0, 90.0, 99.0)
    assert est["n_total"] == 100

    tagged = sk.withColumn("pid", F.lit(0))
    dup = tagged.unionByName(tagged.withColumn("pid", F.lit(1)))
    double = kll_quantiles(kll_merge(dup, ["grp"], "pid", k=128), ["grp"]).collect()[0]
    assert double["n_total"] == 200  # duplicated partial double-counts


def test_streaming_dkll_partials_merge_and_replay(spark, sf_dir, tmp_path):
    """Stream micro-batches -> per-batch dKLL partials via foreachBatch ->
    kll_merge at read time: the merged estimates obey the rank envelope vs
    exact, the read-side merge is rerun-bit-identical (canonical batch_id
    order), and REPLAYING a batch through the sink leaves the merged bytes
    unchanged — the batch_id= dynamic-overwrite contract that makes the
    non-idempotent merge safe (the CMS argument)."""
    import pyspark.sql.functions as FF

    from tranquility_spark.operators.kll import (
        kll_merge,
        kll_partials_sink,
        kll_quantiles,
    )
    from tranquility_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", FF.col("value").cast("double").alias("v")
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    out = str(tmp_path / "kll_partials")
    sink = kll_partials_sink(out, ["event_type"], "v")
    stream = (
        spark.readStream.schema("event_type string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() >= 2
    merged = sorted(
        map(tuple, kll_merge(partials, ["event_type"], "batch_id").collect())
    )
    assert merged == sorted(
        map(
            tuple,
            kll_merge(
                spark.read.parquet(out), ["event_type"], "batch_id"
            ).collect(),
        )
    )
    # rank envelope of the merged estimates vs exact per-type quantiles
    est = {
        r["event_type"]: r
        for r in kll_quantiles(
            kll_merge(spark.read.parquet(out), ["event_type"], "batch_id"),
            ["event_type"],
        ).collect()
    }
    import bisect

    for t in est:
        vals = sorted(
            r["v"] for r in ev.filter(FF.col("event_type") == t).collect()
        )
        assert est[t]["n_total"] == len(vals)
        for qq, col in ((0.5, "p50"), (0.9, "p90")):
            rank = bisect.bisect_right(vals, est[t][col]) / len(vals)
            assert abs(rank - qq) <= 0.05, (t, col, rank)
    # replay contract: delivering the SAME rows under the SAME batch_id a
    # second time REPLACES the partition (dynamic partition overwrite), so
    # the merged bytes are unchanged — redelivery can never double-count.
    # Use a fresh synthetic batch so the replayed rows are exactly known.
    extra = spark.createDataFrame(
        [("replayed", float(i)) for i in range(500)], "event_type string, v double"
    )
    sink(extra, 999)
    once = sorted(
        map(
            tuple,
            kll_merge(
                spark.read.parquet(out), ["event_type"], "batch_id"
            ).collect(),
        )
    )
    sink(extra, 999)  # forced redelivery of the identical batch
    twice = sorted(
        map(
            tuple,
            kll_merge(
                spark.read.parquet(out), ["event_type"], "batch_id"
            ).collect(),
        )
    )
    assert once == twice
    assert {r for r in twice if r[0] == "replayed"}  # the batch is present
    n_replayed = [r[-1] for r in twice if r[0] == "replayed"][0]
    assert n_replayed == 500  # replaced, never appended/doubled


def test_dkll_merge_tolerates_null_partial_id(spark):
    """A NULL partial id (e.g. partials keyed by to_date(ts) over events
    with NULL ts) merges deterministically instead of crashing the
    canonical sort (code-review r8): the null-keyed partial sorts first,
    totals include it, and reruns are bit-identical."""
    from tranquility_spark.operators.kll import kll_merge, kll_partial, kll_quantiles

    df = spark.createDataFrame(
        [("g", "d1", float(i)) for i in range(50)]
        + [("g", None, float(i)) for i in range(100, 140)],
        "grp string, day string, v double",
    )
    partials = kll_partial(df, ["grp", "day"], "v", k=64)
    merged = kll_merge(partials, ["grp"], "day", k=64)
    r1 = sorted(map(tuple, merged.collect()))
    r2 = sorted(map(tuple, kll_merge(partials, ["grp"], "day", k=64).collect()))
    assert r1 == r2 and r1
    est = kll_quantiles(merged, ["grp"]).collect()[0]
    assert est["n_total"] == 90  # both partials, incl. the NULL-keyed one


def test_mg_partial_null_values_contribute_nothing(spark):
    """NULL values are dropped before counting (the f6 policy) — without
    the filter a NULL item inside the top-k crashed map_from_entries with
    NULL_MAP_KEY (code-review r8). A group of only NULLs emits no row."""
    from tranquility_spark.operators.heavy_hitters import mg_partial

    df = spark.createDataFrame(
        [("g", "a")] * 3 + [("g", None)] * 5 + [("h", None)],
        "grp string, v string",
    )
    rows = mg_partial(df, ["grp"], "v", k=4).collect()
    assert len(rows) == 1 and rows[0]["grp"] == "g"
    assert dict(rows[0]["counters"]) == {"a": 3}
    assert rows[0]["n_total"] == 3  # NULLs contributed nothing


def test_cms_estimate_join_map_typed_probe_columns(spark):
    """A probe frame carrying a map-typed column takes the id-join
    fallback (Spark cannot group by MapType) and still returns estimates
    identical to cms_estimate (code-review r8)."""
    from pyspark.sql import functions as FF

    from tranquility_spark.operators.cms import (
        cms_counters,
        cms_estimate,
        cms_estimate_join,
    )

    base = spark.range(300).select((FF.col("id") % 40).alias("k"))
    counters = cms_counters(base, "k", width=64, depth=4)
    probes = base.distinct().withColumn(
        "attrs", FF.create_map(FF.lit("a"), FF.col("k").cast("string"))
    )
    kw = dict(width=64, depth=4)
    via_map = sorted(
        (r["k"], r["est_count"], dict(r["attrs"]))
        for r in cms_estimate(probes, counters, "k", **kw).collect()
    )
    via_join = sorted(
        (r["k"], r["est_count"], dict(r["attrs"]))
        for r in cms_estimate_join(probes, counters, "k", **kw).collect()
    )
    assert via_map == via_join and via_join


# ---------------------------------------------------------------------------
# gk.py — proven-eps deterministic quantile summary (family #8, r9;
# VERDICT r8 #5). The bound is PROVEN, so the tests assert it STRICTLY on
# adversarial inputs — no measured-envelope hedging.
# ---------------------------------------------------------------------------


def _gk_true_rank(sorted_vals, est):
    """Distance of est's rank interval to a target is checked against the
    tightest containing rank: [first index >= est, last index <= est]."""
    import bisect

    lo = bisect.bisect_left(sorted_vals, est)
    hi = bisect.bisect_right(sorted_vals, est) - 1
    return lo, hi


def _gk_assert_bound(spark, vals_by_part, eps, bound_mult):
    """Build per-part partials, merge, and assert every quantile estimate's
    rank error < bound_mult * eps * n — strictly, for a q grid."""
    import math

    from tranquility_spark.operators.gk import gk_merge, gk_partial, gk_quantiles

    rows = [
        ("g", pid, float(v)) for pid, vs in vals_by_part.items() for v in vs
    ]
    df = spark.createDataFrame(rows, "grp string, part string, v double")
    partials = gk_partial(df, ["grp", "part"], "v", eps=eps)
    merged = gk_merge(partials, ["grp"], "part")
    qs = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    est = gk_quantiles(merged, ["grp"], quantiles=qs).collect()[0]
    all_vals = sorted(v for vs in vals_by_part.values() for v in vs)
    n = len(all_vals)
    assert est["n_total"] == n
    for q in qs:
        target = math.floor(q * (n - 1))
        v = est[f"p{q * 100:g}".replace(".", "_")]
        lo, hi = _gk_true_rank(all_vals, v)
        dist = max(0, lo - target, target - hi)
        assert dist < bound_mult * eps * n, (q, v, dist, eps * n)
    return merged


def test_gk_proven_bound_adversarial_distributions(spark):
    """The 2*eps*n one-merge-level bound holds STRICTLY on adversarial
    partial splits: disjoint sorted runs (worst interleaving), heavy
    duplicates, exponential tails, and alternating extremes."""
    n, eps = 4000, 0.02
    # disjoint sorted runs: each partial owns a contiguous value range
    runs = {f"p{i}": [float(i * 1000 + j) for j in range(1000)] for i in range(4)}
    _gk_assert_bound(spark, runs, eps, 2)
    # heavy duplicates: 90% one value, the rest a spread
    dups = {
        "a": [5.0] * 1800 + [float(i) for i in range(200)],
        "b": [5.0] * 1800 + [float(1000 + i) for i in range(200)],
    }
    _gk_assert_bound(spark, dups, eps, 2)
    # exponential tail split across partials by parity
    exp = [1.0001 ** i for i in range(n)]
    _gk_assert_bound(spark, {"e": exp[::2], "o": exp[1::2]}, eps, 2)
    # alternating extremes (zig-zag) — stresses the tie/gap arithmetic
    zig = {"z1": [float((-1) ** i * i) for i in range(n // 2)],
           "z2": [float((-1) ** (i + 1) * i) for i in range(n // 2)]}
    _gk_assert_bound(spark, zig, eps, 2)


def test_gk_partial_exact_below_stride_and_eps_bound(spark):
    """A single partial's own summary errs < eps*n (stride bound); with
    n <= 1/eps the stride is 1 and every quantile is EXACT."""
    import math

    from tranquility_spark.operators.gk import gk_partial, gk_quantiles

    vals = [float(x) for x in range(73)]  # 73 < 1/0.01
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v double"
    )
    s = gk_partial(df, ["grp"], "v", eps=0.01)
    qs = (0.1, 0.5, 0.9)
    est = gk_quantiles(s, ["grp"], quantiles=qs).collect()[0]
    for q in qs:
        assert est[f"p{q * 100:g}".replace(".", "_")] == float(
            math.floor(q * 72)
        )
    # eps*n bound on one bigger partial, strict
    big = sorted((i * 7919) % 6007 for i in range(6007))
    df2 = spark.createDataFrame(
        [("g", float(v)) for v in big], "grp string, v double"
    )
    s2 = gk_partial(df2, ["grp"], "v", eps=0.02)
    est2 = gk_quantiles(s2, ["grp"], quantiles=qs).collect()[0]
    for q in qs:
        v = est2[f"p{q * 100:g}".replace(".", "_")]
        target = math.floor(q * 6006)
        lo, hi = _gk_true_rank([float(x) for x in big], v)
        assert max(0, lo - target, target - hi) < 0.02 * 6007


def test_gk_deterministic_and_partition_invariant(spark):
    """Partials are bit-identical however the raw rows are partitioned or
    ordered (the fold IS a sort), and the merge is deterministic across
    reruns — the property that motivated the family (dKLL's contract,
    now with a proven bound)."""
    from tranquility_spark.operators.gk import gk_merge, gk_partial

    base = [("g", f"p{i % 3}", float((i * 2654435761) % 10007)) for i in range(3000)]
    df1 = spark.createDataFrame(base, "grp string, part string, v double")
    df2 = spark.createDataFrame(
        list(reversed(base)), "grp string, part string, v double"
    ).repartition(17)
    p1 = sorted(map(tuple, gk_partial(df1, ["grp", "part"], "v").collect()))
    p2 = sorted(map(tuple, gk_partial(df2, ["grp", "part"], "v").collect()))
    assert p1 == p2
    m1 = sorted(
        map(tuple, gk_merge(gk_partial(df1, ["grp", "part"], "v"), ["grp"], "part").collect())
    )
    m2 = sorted(
        map(tuple, gk_merge(gk_partial(df2, ["grp", "part"], "v"), ["grp"], "part").collect())
    )
    assert m1 == m2


def test_gk_merge_interval_invariants(spark):
    """Structural proof obligations on the merged summary: rmin <= rmax,
    every interval width < eps*n, and rmin is non-decreasing in value
    order (the gap bound's precondition)."""
    from tranquility_spark.operators.gk import gk_merge, gk_partial

    eps = 0.02
    parts = {
        "a": [float((i * 31) % 977) for i in range(977)],
        "b": [float(500 + (i * 17) % 977) for i in range(977)],
        "c": [250.0] * 500,
    }
    rows = [("g", p, v) for p, vs in parts.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, part string, v double")
    merged = gk_merge(
        gk_partial(df, ["grp", "part"], "v", eps=eps), ["grp"], "part"
    ).collect()
    n = sum(len(v) for v in parts.values())
    assert all(r["n_total"] == n for r in merged)
    ordered = sorted(merged, key=lambda r: (r["value"], r["rmin"]))
    prev_rmin = -1
    for r in ordered:
        assert r["rmin"] <= r["rmax"]
        assert r["rmax"] - r["rmin"] < eps * n, (r, eps * n)
        assert r["rmin"] >= prev_rmin or r["value"] == ordered[0]["value"]
        prev_rmin = max(prev_rmin, r["rmin"])


def test_streaming_gk_partials_merge_and_replay(spark, sf_dir, tmp_path):
    """gk_partials_sink lifecycle: stream micro-batches -> per-batch
    proven-eps partials -> gk_merge at read time. The merged estimates
    obey the PROVEN 2*eps*n rank bound vs exact per-type quantiles
    (strict), the read-side merge is rerun-bit-identical, and replaying a
    batch through the sink leaves the merged bytes unchanged (batch_id=
    dynamic-overwrite, the CMS/kll contract)."""
    import bisect
    import math

    import pyspark.sql.functions as FF

    from tranquility_spark.operators.gk import (
        gk_merge,
        gk_partials_sink,
        gk_quantiles,
    )
    from tranquility_spark.sources.files import load_table

    eps = 0.02
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", FF.col("value").cast("double").alias("v")
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    out = str(tmp_path / "gk_partials")
    sink = gk_partials_sink(out, ["event_type"], "v", eps=eps)
    stream = (
        spark.readStream.schema("event_type string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() >= 2
    merged1 = sorted(
        map(tuple, gk_merge(partials, ["event_type"], "batch_id").collect())
    )
    merged2 = sorted(
        map(
            tuple,
            gk_merge(
                spark.read.parquet(out), ["event_type"], "batch_id"
            ).collect(),
        )
    )
    assert merged1 == merged2  # read-side merge is deterministic

    # replay contract (the kll test's shape): delivering the SAME rows
    # under the SAME batch_id twice REPLACES the partition (dynamic
    # partition overwrite) — merged bytes unchanged, never double-counted
    extra = spark.createDataFrame(
        [("replayed", float(i)) for i in range(500)],
        "event_type string, v double",
    )
    sink(extra, 999)
    once = sorted(
        map(
            tuple,
            gk_merge(
                spark.read.parquet(out), ["event_type"], "batch_id"
            ).collect(),
        )
    )
    sink(extra, 999)
    twice = sorted(
        map(
            tuple,
            gk_merge(
                spark.read.parquet(out), ["event_type"], "batch_id"
            ).collect(),
        )
    )
    assert once == twice
    assert [r for r in twice if r[0] == "replayed"][0][-1] == 500

    # PROVEN bound, asserted strictly: per type, each estimate's true
    # occurrence-rank distance to target < 2*eps*n
    est = {
        r["event_type"]: r
        for r in gk_quantiles(
            gk_merge(spark.read.parquet(out), ["event_type"], "batch_id"),
            ["event_type"],
            quantiles=(0.5, 0.9, 0.99),
        ).collect()
    }
    vals = {}
    for r in ev.collect():
        vals.setdefault(r["event_type"], []).append(r["v"])
    for et, vs in vals.items():
        vs = sorted(v for v in vs if v is not None)
        n = len(vs)
        for qq, colname in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            v = est[et][colname]
            target = math.floor(qq * (n - 1))
            lo = bisect.bisect_left(vs, v)
            hi = bisect.bisect_right(vs, v) - 1
            assert max(0, lo - target, target - hi) < max(1, 2 * eps * n), (
                et,
                qq,
            )


def test_gk_merge_rejects_already_merged_summaries(spark):
    """ADVICE r9 low: the one-merge-level contract ENFORCED — feeding a
    merged summary (rmin != rmax) back through gk_merge must raise, not
    silently produce invalid rank intervals."""
    import pytest as pt

    from tranquility_spark.operators.gk import gk_merge, gk_partial

    df = spark.createDataFrame(
        [("g", i % 4, float(i)) for i in range(4000)],
        "grp string, part int, v double",
    )
    # eps=0.05 over 1000 values/partial -> real compression, so the merge
    # produces genuinely widened (rmin < rmax) intervals
    merged = gk_merge(
        gk_partial(df, ["grp", "part"], "v", eps=0.05), ["grp"], "part"
    )
    assert merged.filter("rmin != rmax").count() > 0  # genuinely merged
    remerge = gk_merge(
        merged.withColumn("part", F.lit(0)), ["grp"], "part"
    )
    with pt.raises(Exception, match="already-merged"):
        remerge.collect()


def test_gk_deep_rollup_over_persisted_summaries(spark, sf_dir, tmp_path):
    """The stated purpose of gk_merge_deep, end-to-end: per-(type, day)
    partials -> per-(type, month) level-1 merges PERSISTED to parquet ->
    read back -> level-2 deep merge per type, WITHOUT re-reading raw
    values. The tree's quantile estimates stay within the summary's own
    gk_certified_error bound vs the exact per-type quantiles, and
    gk_merge refuses the same persisted (already-merged) input."""
    import bisect
    import math

    import pyspark.sql.functions as FF
    import pytest as pt

    from tranquility_spark.operators.gk import (
        gk_certified_error,
        gk_merge,
        gk_merge_deep,
        gk_partial,
        gk_quantiles,
    )
    from tranquility_spark.sources.files import load_table

    eps = 0.02
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        FF.col("value").cast("double").alias("v"),
        FF.to_date("ts").cast("string").alias("day"),
    )
    partials = gk_partial(ev, ["event_type", "day"], "v", eps=eps).withColumn(
        "month", FF.substring("day", 1, 7)
    )
    monthly_dir = str(tmp_path / "gk_monthly")
    gk_merge(partials, ["event_type", "month"], "day").write.parquet(
        monthly_dir
    )

    persisted = spark.read.parquet(monthly_dir)
    # gk_merge refuses WIDENED summaries; at tiny fixture scale the
    # per-day partials are uncompressed (stride 1), so the monthly merge
    # can come out exact (rmin == rmax) and legally re-mergeable — only
    # assert the refusal when widening actually happened (the dedicated
    # reject test covers it unconditionally on synthetic data)
    if persisted.filter("rmin != rmax").count() > 0:
        with pt.raises(Exception, match="already-merged"):
            gk_merge(persisted, ["event_type"], "month").collect()
    tree = gk_merge_deep(persisted, ["event_type"], "month")

    cert = {
        r["event_type"]: r["certified_err"]
        for r in gk_certified_error(tree, ["event_type"]).collect()
    }
    qs = (0.1, 0.5, 0.9)
    est = {
        r["event_type"]: r
        for r in gk_quantiles(tree, ["event_type"], quantiles=qs).collect()
    }
    by_type = {}
    for r in ev.collect():
        if r["v"] is not None:
            by_type.setdefault(r["event_type"], []).append(r["v"])
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        assert est[et]["n_total"] == n
        for q in qs:
            target = math.floor(q * (n - 1))
            v = est[et][f"p{q * 100:g}".replace(".", "_")]
            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v) - 1
            dist = max(0, lo - target, target - hi)
            assert dist <= cert[et], (et, q, dist, cert[et])


def test_gk_merge_deep_degenerate_equals_flat(spark):
    """gk_merge_deep on NEVER-merged partials (rmin == rmax) reduces
    bit-for-bit to gk_merge — the interval engine with degenerate
    intervals is the classic arithmetic (the wrapper relationship,
    asserted at the Spark level)."""
    from tranquility_spark.operators.gk import (
        gk_merge,
        gk_merge_deep,
        gk_partial,
    )

    df = spark.createDataFrame(
        [("g", f"p{i % 5}", float((i * 2654435761) % 9973)) for i in range(5000)],
        "grp string, part string, v double",
    )
    partials = gk_partial(df, ["grp", "part"], "v", eps=0.02)
    flat = sorted(map(tuple, gk_merge(partials, ["grp"], "part").collect()))
    deep = sorted(map(tuple, gk_merge_deep(partials, ["grp"], "part").collect()))
    assert flat == deep and flat


def test_gk_merge_deep_tree_certified_bound(spark):
    """The multi-level rollup gk_merge REFUSES, done legally: day partials
    -> two level-1 merges -> one level-2 gk_merge_deep. Assertions: the
    tree summary is structurally valid (rmin <= rmax, in [0, n-1],
    rmin non-decreasing in (value, rmin) order), every quantile estimate's
    true rank error is within gk_certified_error's COMPUTED bound (the
    contract that replaces the flat 2*eps*n constant), and the tree stays
    inside the doubling envelope (< 4*eps*n for two levels) on this
    adversarial fixture. The flat one-level merge of the same partials
    certifies a bound no worse than the tree's."""
    import math

    from tranquility_spark.operators.gk import (
        gk_certified_error,
        gk_merge,
        gk_merge_deep,
        gk_partial,
        gk_quantiles,
    )

    eps = 0.02
    # adversarial: overlapping ranges WITHIN each half (disjoint ranges
    # would merge with exact intervals and exercise nothing) + a
    # heavy-duplicate partial
    parts = {
        "p0": [float(i) for i in range(1000)],
        "p3": [500.0] * 1000,
        "p1": [float((i * 31) % 1000) for i in range(1000)],
        "p2": [float(250 + i) for i in range(1000)],
    }
    rows = [("g", pid, v) for pid, vs in parts.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, part string, v double")
    partials = gk_partial(df, ["grp", "part"], "v", eps=eps).withColumn(
        "half", F.when(F.col("part").isin("p0", "p3"), "h0").otherwise("h1")
    )
    level1 = gk_merge(partials, ["grp", "half"], "part")
    assert level1.filter("rmin != rmax").count() > 0  # genuinely widened
    tree = gk_merge_deep(level1, ["grp"], "half").collect()

    all_vals = sorted(v for vs in parts.values() for v in vs)
    n = len(all_vals)
    assert all(r["n_total"] == n for r in tree)
    ordered = sorted(tree, key=lambda r: (r["value"], r["rmin"]))
    prev_rmin = -1
    for r in ordered:
        assert 0 <= r["rmin"] <= r["rmax"] <= n - 1
        assert r["rmin"] >= prev_rmin
        prev_rmin = r["rmin"]

    tree_df = gk_merge_deep(level1, ["grp"], "half")
    cert = gk_certified_error(tree_df, ["grp"]).collect()[0]["certified_err"]
    flat_cert = gk_certified_error(
        gk_merge(partials.drop("half"), ["grp"], "part"), ["grp"]
    ).collect()[0]["certified_err"]
    assert flat_cert <= cert  # deeper tree never certifies tighter
    assert cert < 4 * eps * n  # two levels stay inside the doubling envelope

    qs = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    est = gk_quantiles(tree_df, ["grp"], quantiles=qs).collect()[0]
    for q in qs:
        target = math.floor(q * (n - 1))
        v = est[f"p{q * 100:g}".replace(".", "_")]
        lo, hi = _gk_true_rank(all_vals, v)
        dist = max(0, lo - target, target - hi)
        assert dist <= cert, (q, v, dist, cert)
