"""Unit tests for the ingest spec machinery (SURVEY.md §2.2/§2.4)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tranquility_spark.specs import (
    Count,
    DimensionsSpec,
    DoubleSum,
    Filtered,
    Granularity,
    GranularitySpec,
    IngestSpec,
    LongSum,
    TimestampSpec,
    filter_to_column,
)


def test_granularity_hour_truncates(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 13, 45, 12),)], "ts timestamp"
    )
    out = df.select(Granularity("HOUR").truncate(F.col("ts")).alias("b")).first()
    assert out["b"] == dt.datetime(2024, 1, 1, 13, 0, 0)


def test_granularity_five_minute(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 13, 47, 12),)], "ts timestamp"
    )
    out = df.select(Granularity("FIVE_MINUTE").truncate(F.col("ts")).alias("b")).first()
    assert out["b"] == dt.datetime(2024, 1, 1, 13, 45, 0)


def test_granularity_none_identity(spark):
    t = dt.datetime(2024, 1, 1, 13, 47, 12, 345678)
    df = spark.createDataFrame([(t,)], "ts timestamp")
    out = df.select(Granularity("NONE").truncate(F.col("ts")).alias("b")).first()
    assert out["b"] == t


def test_unknown_granularity_raises():
    with pytest.raises(ValueError):
        Granularity("FORTNIGHT")


def test_timestamp_spec_posix_and_millis(spark):
    df = spark.createDataFrame([(1704067200, 1704067200123)], "s long, ms long")
    posix = TimestampSpec(column="s", format="posix").extract(df)
    millis = TimestampSpec(column="ms", format="millis").extract(df)
    row = df.select(posix.alias("p"), millis.alias("m")).first()
    assert row["p"] == dt.datetime(2024, 1, 1, 0, 0, 0)
    assert row["m"] == dt.datetime(2024, 1, 1, 0, 0, 0, 123000)


def test_timestamp_auto_numeric_magnitude(spark):
    # Druid 'auto': large numerics are millis, small are seconds
    df = spark.createDataFrame([(1704067200, 1704067200123)], "sec long, msec long")
    r1 = df.select(TimestampSpec(column="sec", format="auto").extract(df).alias("t")).first()
    r2 = df.select(TimestampSpec(column="msec", format="auto").extract(df).alias("t")).first()
    assert r1["t"].year == 2024 and r2["t"].year == 2024


def test_timestamp_unparseable_dropped(spark):
    from tranquility_spark.plans.rollup import build_rollup

    df = spark.createDataFrame(
        [("2024-01-01T05:00:00", "a", 1.0), ("not-a-time", "b", 2.0)],
        "t string, d string, v double",
    )
    spec = IngestSpec(
        datasource="x",
        timestamp_spec=TimestampSpec(column="t", format="iso", output="ts"),
        dimensions_spec=DimensionsSpec(dimensions=["d"]),
        metrics=(Count("n"),),
        granularity_spec=GranularitySpec(query_granularity="HOUR"),
    )
    rows = build_rollup(spec)(df).collect()
    assert len(rows) == 1 and rows[0]["d"] == "a"


def test_dimensions_schemaless_resolution(spark):
    df = spark.createDataFrame([(1, "x", 2.0, "j", dt.datetime(2024, 1, 1))],
                               "a long, b string, v double, skip string, ts timestamp")
    dims = DimensionsSpec(dimensions=None, exclusions=("skip",)).resolve(df, "ts", ["v"])
    assert dims == ["a", "b"]


def test_spec_name_collision_raises():
    spec = IngestSpec(
        datasource="x",
        timestamp_spec=TimestampSpec(column="t", output="ts"),
        dimensions_spec=DimensionsSpec(dimensions=["d", "d"]),
        metrics=(),
    )
    with pytest.raises(ValueError, match="collision"):
        spec.validate()


def test_filter_to_column_variants(spark):
    df = spark.createDataFrame(
        [("purchase", 120.0), ("click", 10.0), ("signup", 60.0)], "et string, v double"
    )
    sel = df.filter(filter_to_column({"type": "selector", "dimension": "et", "value": "click"}))
    assert sel.count() == 1
    bound = df.filter(
        filter_to_column({"type": "bound", "dimension": "v", "lower": 50, "upper": 130, "ordering": "numeric"})
    )
    assert bound.count() == 2
    neg = df.filter(filter_to_column({"type": "not", "field": {"type": "regex", "dimension": "et", "pattern": "^c"}}))
    assert neg.count() == 2


def test_spatial_filter_bounds(spark):
    """r12 spatialFilter semantics (SpatialFilter / RectangularBound /
    RadiusBound [recall]): rectangular is INCLUSIVE on both ends per
    coordinate; radius is Euclidean distance <= radius (boundary point
    included); malformed or truncated coords rows are excluded, never an
    ANSI cast error; the SQL twin agrees row-for-row via DuckDB."""
    import duckdb

    from tranquility_spark.specs import filter_to_sql

    rows = [
        ("on_min", "-30.0,-60.0"),
        ("on_max", "30.0,60.0"),
        ("inside", "0.0,0.0"),
        ("lat_out", "30.01,0.0"),
        ("lon_out", "0.0,-60.5"),
        ("on_radius", "13.0,24.0"),   # distance from (10,20) = 5 exactly
        ("malformed", "x,1.0"),
        ("truncated", "5.0"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "tag string, coords string")
    rect = {
        "type": "spatial",
        "dimension": "coords",
        "bound": {
            "type": "rectangular",
            "minCoords": [-30.0, -60.0],
            "maxCoords": [30.0, 60.0],
        },
    }
    radius = {
        "type": "spatial",
        "dimension": "coords",
        "bound": {"type": "radius", "coords": [10.0, 20.0], "radius": 5.0},
    }
    got_rect = {r["tag"] for r in df.filter(filter_to_column(rect)).collect()}
    assert got_rect == {"on_min", "on_max", "inside", "on_radius"}
    got_rad = {r["tag"] for r in df.filter(filter_to_column(radius)).collect()}
    assert got_rad == {"on_radius"}  # boundary point included

    # SQL twin parity on the same rows
    con = duckdb.connect()
    con.execute("CREATE TABLE t(tag VARCHAR, coords VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for spec, want in ((rect, got_rect), (radius, got_rad)):
        sql_rows = con.execute(
            f"SELECT tag FROM t WHERE {filter_to_sql(spec)}"
        ).fetchall()
        assert {t for (t,) in sql_rows} == want, spec


def test_spatial_cell_layout_prunes_partitions(spark, tmp_path):
    """r12 spatial scale path: a layout partitioned by the coarse geo cell
    turns a spatialFilter into partition pruning (the dq19 docstring's
    claim, plan-asserted like the IVF inverted-list reads), and the
    covering cell list is a superset — pruning before the exact
    row-level predicate loses NO rows vs the unpruned filter."""
    from tranquility_spark.specs import (
        filter_to_column,
        spatial_cell_column,
        spatial_cells_for_bound,
    )

    rows = [
        (i, f"{(i * 7) % 180 - 90}.5,{(i * 13) % 360 - 180}.25")
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, coords string").withColumn(
        "cell", spatial_cell_column("coords", 30.0)
    )
    root = str(tmp_path / "geo")
    df.write.partitionBy("cell").parquet(root)

    for bound in (
        {"type": "rectangular", "minCoords": [-30.0, -60.0], "maxCoords": [30.0, 60.0]},
        {"type": "radius", "coords": [10.0, 20.0], "radius": 35.0},
    ):
        spec = {"type": "spatial", "dimension": "coords", "bound": bound}
        cells = spatial_cells_for_bound(bound, 30.0)
        base = spark.read.option("basePath", root).parquet(root)
        pruned = base.filter(
            F.col("cell").isin(cells) & filter_to_column(spec)
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        pf = plan.split("PartitionFilters: [")[1].split("]")[0]
        assert "cell" in pf and ("INSET" in pf or " IN " in pf), (
            f"no partition pruning:\n{plan}"
        )
        # covering property: pruning loses nothing vs the unpruned filter
        unpruned = base.filter(filter_to_column(spec))
        got = {r["id"] for r in pruned.collect()}
        want = {r["id"] for r in unpruned.collect()}
        assert got == want and len(want) > 0, bound


def test_spatial_cells_nd_and_validation():
    """r13 (ADVICE r12): spatial_cells_for_bound is n-dimensional like the
    row-level filter it prunes for — a 3-D bound covers a 3-D cell grid
    instead of raising an opaque 2-tuple unpack ValueError — and
    malformed bounds get explicit errors."""
    from tranquility_spark.specs import spatial_cells_for_bound

    # 2-D output byte-identical to the r12 shape (gx-major ordering)
    cells = spatial_cells_for_bound(
        {
            "type": "rectangular",
            "minCoords": [-1.0, -1.0],
            "maxCoords": [1.0, 1.0],
        },
        1.0,
    )
    assert cells == [
        "-1_-1", "-1_0", "-1_1",
        "0_-1", "0_0", "0_1",
        "1_-1", "1_0", "1_1",
    ]
    # 3-D radius bound: bounding cube inside one cell
    assert spatial_cells_for_bound(
        {"type": "radius", "coords": [0.5, 0.5, 0.5], "radius": 0.4}, 1.0
    ) == ["0_0_0"]
    # 3-D rectangular spanning two cells along the third axis only
    assert spatial_cells_for_bound(
        {
            "type": "rectangular",
            "minCoords": [0.1, 0.1, 0.9],
            "maxCoords": [0.9, 0.9, 1.1],
        },
        1.0,
    ) == ["0_0_0", "0_0_1"]
    with pytest.raises(ValueError, match="dims"):
        spatial_cells_for_bound(
            {"type": "rectangular", "minCoords": [0.0], "maxCoords": [0.0, 1.0]},
            1.0,
        )
    with pytest.raises(ValueError, match="no coordinates"):
        spatial_cells_for_bound(
            {"type": "rectangular", "minCoords": [], "maxCoords": []}, 1.0
        )
    # r13: the covering enumeration is driver-side O(cells in box) — a
    # near-full-extent bound over a fine grid must fail loudly with the
    # remedy, not hang or OOM the driver (found by the covering fuzz)
    with pytest.raises(ValueError, match="coarsen cell_deg"):
        spatial_cells_for_bound(
            {
                "type": "rectangular",
                "minCoords": [-1000.0, -1000.0, -1000.0],
                "maxCoords": [1000.0, 1000.0, 1000.0],
            },
            0.1,
        )


def test_spatial_cell_layout_3d_covering(spark):
    """The n-D generalization end-to-end: a 3-D cell column + 3-D bound
    covering keeps the pruned-equals-unpruned property (the 2-D layout
    test's covering assertion, third axis added)."""
    from tranquility_spark.specs import (
        filter_to_column,
        spatial_cell_column,
        spatial_cells_for_bound,
    )

    rows = [
        (
            i,
            f"{(i * 7) % 100 - 50}.5,{(i * 13) % 100 - 50}.25,{(i * 3) % 100 - 50}.75",
        )
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "id long, coords string").withColumn(
        "cell", spatial_cell_column("coords", 25.0, n_dims=3)
    )
    bound = {
        "type": "rectangular",
        "minCoords": [-20.0, -20.0, -20.0],
        "maxCoords": [20.0, 20.0, 20.0],
    }
    spec = {"type": "spatial", "dimension": "coords", "bound": bound}
    cells = spatial_cells_for_bound(bound, 25.0)
    pruned = df.filter(F.col("cell").isin(cells) & filter_to_column(spec))
    unpruned = df.filter(filter_to_column(spec))
    got = {r["id"] for r in pruned.collect()}
    want = {r["id"] for r in unpruned.collect()}
    assert got == want and len(want) > 0


def test_spatial_served_read_prunes_and_matches_unpruned(spark, tmp_path):
    """r13 (dq20): the first-class served path — write_spatial_layout +
    read_spatial_filtered — prunes partitions (PartitionFilters IN-list on
    the cell column) and returns exactly the unpruned filter's rows, even
    when the corpus contains malformed/NULL coordinates (they land in the
    default partition, which the covering list never selects and the row
    predicate never passes)."""
    from tranquility_spark.sources.spatial import (
        read_spatial_filtered,
        write_spatial_layout,
    )

    rows = [
        (i, f"{(i * 7) % 180 - 90}.5,{(i * 13) % 360 - 180}.25")
        for i in range(3000)
    ] + [
        (9001, "not-a-coord"),
        (9002, None),
        (9003, "12.0"),
        # r13 code-review find: try_cast('double') PARSES these strings —
        # without the finite-only guard NaN floor-casts to cell 0 (a REAL
        # cell) and Infinity to Long.MAX (an absurd partition directory)
        (9004, "NaN,5.0"),
        (9005, "Infinity,5.0"),
        (9006, "-Infinity,-5.0"),
    ]
    df = spark.createDataFrame(rows, "id long, coords string")
    layout = str(tmp_path / "geo_served")
    write_spatial_layout(df, layout, dim="coords", cell_deg=30.0)

    spec = {
        "type": "spatial",
        "dimension": "coords",
        "bound": {
            "type": "rectangular",
            "minCoords": [-30.0, -60.0],
            "maxCoords": [30.0, 60.0],
        },
    }
    pruned = read_spatial_filtered(spark, layout, spec, cell_deg=30.0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "cell" in pf and ("INSET" in pf or " IN " in pf), plan

    base = spark.read.option("basePath", layout).parquet(layout)
    unpruned = base.filter(filter_to_column(spec))
    got = {r["id"] for r in pruned.collect()}
    want = {r["id"] for r in unpruned.collect()}
    assert got == want and len(want) > 0
    assert not {9001, 9002, 9003, 9004, 9005, 9006} & got
    # the malformed rows are quarantined in the DEFAULT partition — a
    # half-parsed "12.0" must NOT be filed under a real cell id like "0"
    # (r13 self-review: concat_ws skips NULL args)
    quarantined = {
        r["id"]
        for r in base.filter(F.col("cell").isNull()).select("id").collect()
    }
    assert quarantined == {9001, 9002, 9003, 9004, 9005, 9006}


def test_spatial_read_falls_back_when_covering_too_wide(spark, tmp_path):
    """r13 code-review find: the max_cells guard must not turn a
    previously-working wide-bound read into a hard failure —
    read_spatial_filtered falls back to the unpruned scan (same rows,
    no IN-list) when the covering enumeration would explode, while
    genuine spec errors still propagate."""
    import pytest as pt

    from tranquility_spark.sources.spatial import (
        read_spatial_filtered,
        write_spatial_layout,
    )

    rows = [(i, f"{(i * 7) % 100 - 50}.5,{(i * 13) % 100 - 50}.25") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, coords string")
    layout = str(tmp_path / "geo_wide")
    write_spatial_layout(df, layout, dim="coords", cell_deg=0.5)

    wide = {
        "type": "spatial",
        "dimension": "coords",
        "bound": {
            "type": "rectangular",
            "minCoords": [-10000.0, -10000.0],
            "maxCoords": [10000.0, 10000.0],
        },
    }
    got = read_spatial_filtered(spark, layout, wide, cell_deg=0.5, max_cells=1000)
    assert got.count() == 500  # unpruned fallback — every row matches
    # a genuine spec error is NOT swallowed by the fallback
    bad = {
        "type": "spatial",
        "dimension": "coords",
        "bound": {"type": "rectangular", "minCoords": [0.0], "maxCoords": [0.0, 1.0]},
    }
    with pt.raises(ValueError, match="dims"):
        read_spatial_filtered(spark, layout, bad, cell_deg=0.5)


def test_rollup_collapses_duplicate_keys(spark):
    # FIXTURES.md B5 rollup_dupes: identical (trunc ts, dims) rows collapse
    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (base + dt.timedelta(seconds=10), "a", 1.0),
        (base + dt.timedelta(seconds=50), "a", 2.0),
        (base + dt.timedelta(minutes=2), "a", 4.0),
        (base + dt.timedelta(seconds=30), "b", 8.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, d string, v double")
    spec = IngestSpec(
        datasource="x",
        timestamp_spec=TimestampSpec(column="ts", output="ts"),
        dimensions_spec=DimensionsSpec(dimensions=["d"]),
        metrics=(Count("n"), DoubleSum("s", "v"), LongSum("ls", "v")),
        granularity_spec=GranularitySpec(query_granularity="MINUTE"),
    )
    from tranquility_spark.plans.rollup import build_rollup

    out = {(r["ts"], r["d"]): (r["n"], r["s"], r["ls"]) for r in build_rollup(spec)(df).collect()}
    assert out[(base, "a")] == (2, 3.0, 3)
    assert out[(base + dt.timedelta(minutes=2), "a")] == (1, 4.0, 4)
    assert out[(base, "b")] == (1, 8.0, 8)


def test_rollup_disabled_appends_raw(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 0, 5), "a", 1.0)] * 3, "ts timestamp, d string, v double"
    )
    spec = IngestSpec(
        datasource="x",
        timestamp_spec=TimestampSpec(column="ts", output="ts"),
        dimensions_spec=DimensionsSpec(dimensions=["d"]),
        metrics=(DoubleSum("s", "v"),),
        granularity_spec=GranularitySpec(rollup=False),
    )
    from tranquility_spark.plans.rollup import build_rollup

    out = build_rollup(spec)(df)
    assert out.count() == 3  # no aggregation
    assert set(out.columns) == {"ts", "d", "v"}


def test_filtered_aggregator_matches_manual(spark):
    df = spark.createDataFrame(
        [("purchase", 10.0), ("purchase", 20.0), ("click", 99.0)], "event_type string, value double"
    )
    m = Filtered(
        {"type": "selector", "dimension": "event_type", "value": "purchase"},
        DoubleSum("rev", "value"),
    )
    row = df.agg(m.column()).first()
    assert row["rev"] == 30.0


def test_parse_druid_spec_full_task_layout(spark):
    """A realistic tranquility-era ingestion spec parses and runs end-to-end."""
    from tranquility_spark.plans.rollup import build_rollup
    from tranquility_spark.specs import parse_druid_spec

    druid_spec = {
        "dataSchema": {
            "dataSource": "wikipedia",
            "parser": {
                "type": "string",
                "parseSpec": {
                    "format": "json",
                    "timestampSpec": {"column": "timestamp", "format": "iso"},
                    "dimensionsSpec": {
                        "dimensions": ["page", {"type": "string", "name": "channel"}],
                        "dimensionExclusions": [],
                    },
                },
            },
            "metricsSpec": [
                {"type": "count", "name": "count"},
                {"type": "doubleSum", "name": "added_sum", "fieldName": "added"},
                {"type": "longMax", "name": "max_delta", "fieldName": "delta"},
                {
                    "type": "filtered",
                    "filter": {"type": "selector", "dimension": "channel", "value": "en"},
                    "aggregator": {"type": "count", "name": "en_count"},
                },
                {"type": "hyperUnique", "name": "uniq_users", "fieldName": "user"},
            ],
            "granularitySpec": {
                "type": "uniform",
                "segmentGranularity": "HOUR",
                "queryGranularity": "MINUTE",
                "rollup": True,
            },
        },
        "tuningConfig": {"type": "realtime"},  # ignored — Spark owns tuning
    }
    spec = parse_druid_spec(druid_spec)
    assert spec.datasource == "wikipedia"
    assert spec.timestamp_spec.format == "iso"
    assert spec.dimensions_spec.dimensions == ("page", "channel")
    assert [m.name for m in spec.metrics] == [
        "count", "added_sum", "max_delta", "en_count", "uniq_users",
    ]
    assert spec.granularity_spec.segment_granularity.name == "HOUR"
    assert spec.granularity_spec.query_granularity.name == "MINUTE"

    df = spark.createDataFrame(
        [
            ("2024-06-01T11:05:10", "Spark", "en", 3.0, 7, "alice"),
            ("2024-06-01T11:05:40", "Spark", "en", 2.0, 1, "bob"),
            ("2024-06-01T11:05:20", "Spark", "de", 5.0, 9, "alice"),
        ],
        "timestamp string, page string, channel string, added double, delta long, user string",
    )
    rows = sorted(build_rollup(spec)(df).collect(), key=lambda r: r.channel)
    assert [r.channel for r in rows] == ["de", "en"]
    en, de = rows[1], rows[0]
    # r["count"]: attribute access collides with tuple.count on Row
    assert (en["count"], en.added_sum, en.max_delta, en.en_count) == (2, 5.0, 7, 2)
    assert (de["count"], de.en_count) == (1, 0)


def test_parse_druid_spec_flattened_layout_defaults():
    from tranquility_spark.specs import parse_druid_spec

    spec = parse_druid_spec(
        {"dataSchema": {"dataSource": "x", "timestampSpec": {"column": "ts"}}}
    )
    assert spec.datasource == "x"
    assert spec.timestamp_spec.column == "ts"
    assert spec.dimensions_spec.dimensions is None  # schemaless
    assert spec.granularity_spec.segment_granularity.name == "HOUR"


def test_parse_druid_spec_rejects_unknown_aggregator():
    import pytest as _pytest

    from tranquility_spark.specs import parse_druid_spec

    with _pytest.raises(ValueError, match="javascript"):
        parse_druid_spec(
            {"dataSchema": {"metricsSpec": [{"type": "javascript", "name": "j"}]}}
        )


def test_spatial_dimensions_rollup(spark):
    """spatialDimensions: lat/lon fields join into a Druid-style coord dim."""
    from tranquility_spark.plans.rollup import build_rollup
    from tranquility_spark.specs import parse_druid_spec

    spec = parse_druid_spec({
        "dataSchema": {
            "dataSource": "geo",
            "parser": {"parseSpec": {
                "timestampSpec": {"column": "timestamp", "format": "iso"},
                "dimensionsSpec": {
                    "dimensions": ["city"],
                    "spatialDimensions": [{"dimName": "coord", "dims": ["lat", "lon"]}],
                },
            }},
            "metricsSpec": [{"type": "count", "name": "n"}],
            "granularitySpec": {"segmentGranularity": "HOUR", "queryGranularity": "HOUR"},
        }
    })
    assert spec.dimensions_spec.spatial_dimensions == (("coord", ("lat", "lon")),)
    df = spark.createDataFrame(
        [
            ("2024-06-01T11:05:10", "sf", 37.77, -122.42),
            ("2024-06-01T11:45:00", "sf", 37.77, -122.42),
            ("2024-06-01T11:50:00", "nyc", 40.71, -74.01),
        ],
        "timestamp string, city string, lat double, lon double",
    )
    rows = {r.coord: r.n for r in build_rollup(spec)(df).collect()}
    assert rows == {"37.77,-122.42": 2, "40.71,-74.01": 1}


def test_spatial_read_sidecar_and_fallbacks(spark, tmp_path):
    """r14 code-review hardening of the served spatial read, four guards:

    1. the grid sidecar makes a write/read cell_deg mismatch HARMLESS —
       the read takes the grid from the layout's _spatial_meta.json, so
       covering ids always match the directories that exist;
    2. a well-formed bound of DIFFERENT dimensionality than the layout
       falls back to the unpruned scan (its covering ids could match no
       directory — the IN-list would silently prune everything);
    3. a compound spec with no top-level bound stays total;
    4. a degenerate bound with an EMPTY covering (negative radius) stays
       row-identical to the unpruned filter."""
    from tranquility_spark.sources.spatial import (
        read_spatial_filtered,
        write_spatial_layout,
    )

    rows = [
        (i, f"{(i * 7) % 180 - 90}.5,{(i * 13) % 360 - 180}.25")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, coords string")
    layout = str(tmp_path / "geo_meta")
    write_spatial_layout(df, layout, dim="coords", cell_deg=5.0)  # FINE grid

    rect = {
        "type": "spatial",
        "dimension": "coords",
        "bound": {
            "type": "rectangular",
            "minCoords": [-30.0, -60.0],
            "maxCoords": [30.0, 60.0],
        },
    }
    # (1) caller passes the WRONG grid — the sidecar corrects it
    got = read_spatial_filtered(spark, layout, rect, cell_deg=30.0)
    want = spark.read.parquet(layout).filter(filter_to_column(rect))
    assert {r.id for r in got.collect()} == {r.id for r in want.collect()} != set()

    # (2) 3-D bound over the 2-D layout: valid bound, wrong dims — fallback
    rect3 = {
        "type": "spatial",
        "dimension": "coords",
        "bound": {
            "type": "rectangular",
            "minCoords": [-90.0, -180.0, 0.0],
            "maxCoords": [90.0, 180.0, 1.0],
        },
    }
    got3 = read_spatial_filtered(spark, layout, rect3)
    want3 = spark.read.parquet(layout).filter(filter_to_column(rect3))
    assert got3.count() == want3.count()

    # (3) compound spec — no top-level bound, stays total
    compound = {"type": "and", "fields": [rect]}
    gotc = read_spatial_filtered(spark, layout, compound)
    assert {r.id for r in gotc.collect()} == {r.id for r in want.collect()}

    # (4) negative radius: row predicate d2 <= r2 still matches rows
    # within |r|; the EMPTY covering must not drop them
    neg = {
        "type": "spatial",
        "dimension": "coords",
        "bound": {"type": "radius", "coords": [-89.5, -179.75], "radius": -1.0},
    }
    gotn = read_spatial_filtered(spark, layout, neg)
    wantn = spark.read.parquet(layout).filter(filter_to_column(neg))
    assert sorted(r.id for r in gotn.collect()) == sorted(
        r.id for r in wantn.collect()
    )

    # and the collision guard: a corpus that already has a 'cell' column
    import pytest as pt

    with pt.raises(ValueError, match="'cell' column"):
        write_spatial_layout(
            df.withColumn("cell", df.id), str(tmp_path / "geo_clash")
        )
