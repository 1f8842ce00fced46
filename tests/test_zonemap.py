"""Zone-map data skipping (plans/zonemap.py), the UDTF gate's engine-side
twin checks, and the df.observe inline-metrics surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.io.tables import load_table
from strava_vector_search_spark.plans import zonemap as Z

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def laid_out(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zm") / "orders_zm")
    orders = load_table(spark, SF_DIR, "orders")
    (
        orders.repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(path)
    )
    zm = Z.build_zonemap(spark, path, ["o_totalprice"]).cache()
    zm.count()
    return path, zm


def test_zonemap_one_row_per_file(spark, laid_out):
    path, zm = laid_out
    n_files = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    assert zm.count() == n_files == 8
    total = zm.agg(F.sum("n_rows")).first()[0]
    assert total == spark.read.parquet(path).count()


def test_selective_predicate_prunes_most_files(spark, laid_out):
    path, zm = laid_out
    lo, hi = 100000.0, 150000.0
    files = Z.prune_files(zm, "o_totalprice", lo, hi)
    # range-clustered layout → a ~10%-of-range predicate touches few files
    assert 0 < len(files) <= 3 < zm.count()
    pruned = Z.read_pruned(spark, zm, "o_totalprice", lo, hi)
    expected = (
        spark.read.parquet(path)
        .filter(F.col("o_totalprice").between(lo, hi))
    )
    assert pruned.count() == expected.count()
    assert (
        pruned.agg(F.sum("o_orderkey")).first()[0]
        == expected.agg(F.sum("o_orderkey")).first()[0]
    )


def test_pruning_is_conservative_and_exact(spark, laid_out):
    """A predicate that overlaps every envelope keeps every file, and the
    re-applied exact filter still makes the result correct (zone maps are
    a pruning aid, never the filter)."""
    path, zm = laid_out
    files = Z.prune_files(zm, "o_totalprice", None, None)
    assert len(files) == zm.count()
    pruned = Z.read_pruned(spark, zm, "o_totalprice", None, None)
    assert pruned.count() == spark.read.parquet(path).count()


def test_fully_pruned_read_is_empty_with_schema(spark, laid_out):
    path, zm = laid_out
    out = Z.read_pruned(spark, zm, "o_totalprice", 1e12, None)
    assert out.count() == 0
    assert "o_orderkey" in out.columns


def test_incremental_update_equals_rebuild(spark, laid_out, tmp_path):
    path, zm = laid_out
    path2 = str(tmp_path / "orders_app")
    spark.read.parquet(path).write.parquet(path2)
    zm2 = Z.build_zonemap(spark, path2, ["o_totalprice"])
    # append a batch → new files appear; update must stat ONLY those
    extra = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1e6))
    )
    extra.repartition(2).write.mode("append").parquet(path2)
    updated = Z.update_zonemap(spark, path2, zm2, ["o_totalprice"])
    rebuilt = Z.build_zonemap(spark, path2, ["o_totalprice"])
    u = {r["file"]: (r["n_rows"], r["min_o_totalprice"], r["max_o_totalprice"])
         for r in updated.collect()}
    b = {r["file"]: (r["n_rows"], r["min_o_totalprice"], r["max_o_totalprice"])
         for r in rebuilt.collect()}
    assert u == b
    assert len(u) > zm2.count()


def test_udtf_matches_expression_twin(spark):
    """The UDTF gate's windows must agree with the set-oriented expression
    formulation (sequence + transform) — the fast path the engine would
    actually use at scale."""
    from strava_vector_search_spark.queries import QUERIES

    udtf_out = QUERIES["f_udtf_char_windows"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 40)
    expr_out = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.expr(
                "explode(transform(sequence(0, cast(ceil(length(text)/30.0) "
                "as int) - 1), i -> struct(cast(i as int) as win_idx, "
                "cast(i*30 as int) as start, "
                "cast(least(40, length(text) - i*30) as int) as win_len, "
                "substr(text, i*30 + 1, 20) as preview)))"
            ).alias("w"),
        )
        .select("doc_id", "w.*")
    )
    a = sorted(map(tuple, udtf_out.collect()))
    b = sorted(map(tuple, expr_out.collect()))
    assert a == b and len(a) > 0


def test_observe_inline_metrics(spark):
    """df.observe: quality metrics collected DURING the main action (one
    CollectMetrics node, zero extra scans) match a separately computed
    aggregate — the 100 TB way to get row counts / null rates / sums out
    of a pipeline run without re-reading the input."""
    from pyspark.sql import Observation

    docs = load_table(spark, SF_DIR, "documents")
    obs = Observation("dq")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text").cast("decimal(18,0)")).alias("total_chars"),
        F.count(F.when(F.col("lang").isNull(), 1)).alias("null_lang"),
    )
    n_out = observed.filter(F.length("text") > 100).count()
    got = obs.get
    exp = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text").cast("decimal(18,0)")).alias("total_chars"),
        F.count(F.when(F.col("lang").isNull(), 1)).alias("null_lang"),
    ).first()
    assert got["n_rows"] == exp["n_rows"]
    assert got["total_chars"] == exp["total_chars"]
    assert got["null_lang"] == exp["null_lang"]
    assert n_out <= got["n_rows"]


def test_zorder_2d_prunes_on_both_columns(spark):
    """On the Morton layout, BOTH columns' zone maps are selective, and
    the conjunctive intersection reads fewer files than either column
    alone admits — the property a single-column sort cannot give."""
    from strava_vector_search_spark.io.tables import load_table
    from strava_vector_search_spark.plans import zonemap as Z
    from strava_vector_search_spark.plans.layout import write_zordered

    orders = load_table(spark, SF_DIR, "orders")
    path = "/tmp/svs_test_zorder2d"
    hi_c = float(orders.agg(F.max("o_custkey")).first()[0])
    write_zordered(
        orders,
        path,
        ["o_totalprice", "o_custkey"],
        {"o_totalprice": (1000.0, 510000.0), "o_custkey": (0.0, hi_c)},
        num_files=16,
    )
    zm = Z.build_zonemap(spark, path, ["o_totalprice", "o_custkey"]).cache()
    n = zm.count()
    f_p = set(Z.prune_files(zm, "o_totalprice", 100000.0, 200000.0))
    f_c = set(Z.prune_files(zm, "o_custkey", None, hi_c * 0.25))
    both = f_p & f_c
    # each column prunes SOMETHING on a z-ordered layout...
    assert len(f_p) < n and len(f_c) < n
    # ...and the conjunction prunes strictly more than either alone
    assert len(both) < min(len(f_p), len(f_c))
    # value parity with the plain filtered scan
    got = (
        spark.read.parquet(*sorted(both))
        .filter(F.col("o_totalprice").between(100000.0, 200000.0))
        .filter(F.col("o_custkey") <= hi_c * 0.25)
        .count()
    )
    exp = (
        spark.read.parquet(path)
        .filter(F.col("o_totalprice").between(100000.0, 200000.0))
        .filter(F.col("o_custkey") <= hi_c * 0.25)
        .count()
    )
    assert got == exp


def test_streaming_zonemap_maintenance(spark, tmp_path):
    """Zone-map kept fresh under a LIVE stream: a foreachBatch sink lands
    each micro-batch as parquet and incrementally extends the stats table
    (update_zonemap stats only the new files). After two waves the
    maintained map must equal a from-scratch rebuild — the ops loop a
    streaming-append table needs for data skipping to stay usable."""
    src = str(tmp_path / "zm_src")
    tgt = str(tmp_path / "zm_tgt")
    ckpt = str(tmp_path / "zm_ckpt")

    def _wave(lo, hi):
        spark.createDataFrame(
            [(i, float(i * 10)) for i in range(lo, hi)], "k long, price double"
        ).coalesce(1).write.mode("append").parquet(src)

    _wave(0, 500)

    state = {"zm": None}

    def land(batch_df, batch_id):
        batch_df.write.mode("append").parquet(tgt)
        if state["zm"] is None:
            state["zm"] = Z.build_zonemap(spark, tgt, ["price"])
        else:
            state["zm"] = Z.update_zonemap(spark, tgt, state["zm"], ["price"])
        # materialize so the lineage doesn't re-scan later waves' files
        state["zm"] = spark.createDataFrame(
            state["zm"].collect(), state["zm"].schema
        )

    stream = spark.readStream.schema("k long, price double").parquet(src)
    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _wave(500, 800)
    q2 = (
        spark.readStream.schema("k long, price double")
        .parquet(src)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    rebuilt = Z.build_zonemap(spark, tgt, ["price"])
    m = {
        r["file"]: (r["n_rows"], r["min_price"], r["max_price"])
        for r in state["zm"].collect()
    }
    b = {
        r["file"]: (r["n_rows"], r["min_price"], r["max_price"])
        for r in rebuilt.collect()
    }
    assert m == b and len(m) >= 2
    # and the maintained map still prunes correctly
    files = Z.prune_files(state["zm"], "price", 6000.0, 7000.0)
    assert 0 < len(files) < len(m)


def test_zonemap_conservative_property(spark, laid_out):
    """Property (hypothesis): for ANY range predicate — open, closed,
    empty, inverted, or degenerate — a file dropped by prune_files
    contains NO row matching the predicate, and the files kept plus the
    exact re-filter reproduce the brute-force answer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    path, zm = laid_out
    rows = (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"), "o_totalprice", "o_orderkey"
        )
        .collect()
    )
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["file"], []).append(r["o_totalprice"])

    bound = st.one_of(
        st.none(), st.floats(min_value=0.0, max_value=600000.0, width=32)
    )

    @settings(max_examples=20, deadline=None)
    @given(lo=bound, hi=bound)
    def check(lo, hi):
        kept = set(Z.prune_files(zm, "o_totalprice", lo, hi))

        def matches(v):
            return (lo is None or v >= lo) and (hi is None or v <= hi)

        for f, vals in by_file.items():
            if f not in kept:
                assert not any(matches(v) for v in vals), (f, lo, hi)
        expect = sum(1 for vals in by_file.values() for v in vals if matches(v))
        got = sum(
            1 for f in kept for v in by_file[f] if matches(v)
        )
        assert got == expect

    check()


def test_empty_zonemap_read_raises_clearly(spark, laid_out):
    """An EMPTY zone map has no files and therefore no schema — read_pruned
    must fail with the documented ValueError, not a zero-path parquet read."""
    _, zm = laid_out
    empty = zm.filter(F.lit(False))
    with pytest.raises(ValueError, match="EMPTY zone map"):
        Z.read_pruned(spark, empty, "o_totalprice", 0.0, 1.0)
