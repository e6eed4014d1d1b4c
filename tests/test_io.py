"""Source/sink coverage (SURVEY §2.1): retail CSV ingest with encoding,
event JSON roundtrip, partitioned lake writes with partition pruning."""

from __future__ import annotations

import contextlib
import io as pyio
import os

import pytest
from pyspark.sql import functions as F


def test_retail_csv_ingest(spark, tmp_path):
    """S1: header CSV, ISO-8859-1 encoding, M/d/yyyy H:mm timestamps
    (the UK Online Retail format, data_loader.py:41)."""
    from ecommerce_analytics_spark.io import read_retail_csv
    csv = tmp_path / "retail.csv"
    csv.write_bytes(
        b"InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country\n"
        b"536365,85123A,WHITE HANGING HEART,6,12/1/2010 8:26,2.55,17850,United Kingdom\n"
        b"C536379,D,Discount caf\xe9,-1,12/1/2010 9:41,27.5,14527,United Kingdom\n"
        b"536370,22728,ALARM CLOCK,24,12/1/2010 8:45,3.75,,France\n")
    df = read_retail_csv(spark, str(csv))
    rows = {r["InvoiceNo"]: r for r in df.collect()}
    assert rows["536365"]["Quantity"] == 6
    assert rows["536365"]["InvoiceDate"].hour == 8
    assert rows["C536379"]["Description"] == "Discount café"  # latin-1
    assert rows["C536379"]["UnitPrice"] == 27.5
    assert rows["536370"]["CustomerID"] is None  # nullable → P3 policy


def test_events_json_roundtrip(spark, tmp_path):
    """S2/S3 + P11: nested event struct → JSON sink → JSON scan."""
    from ecommerce_analytics_spark.io import (read_events_json,
                                              write_events_json)
    from ecommerce_analytics_spark.schemas import CUSTOMER_EVENT
    rows = [
        ("536365_85123A", "first_purchase", "customer_17850",
         "2010-12-01T08:26:00",
         ("536365", "85123A", "WHITE HANGING HEART", 6, 2.55, 15.3,
          "United Kingdom", False, "identified", "holiday"),
         ("2010-12-01T08:26:00", "2024-01-01T00:00:00", 1000)),
    ]
    df = spark.createDataFrame(rows, CUSTOMER_EVENT)
    out = str(tmp_path / "events_json")
    write_events_json(df, out)
    back = read_events_json(spark, out)
    r = back.collect()[0]
    assert r["event_id"] == "536365_85123A"
    assert r["metadata"]["quantity"] == 6
    assert r["metadata"]["is_return"] is False
    assert r["simulation"]["compression_factor"] == 1000


def test_partitioned_lake_write_and_pruning(spark, sf_dir, tmp_path):
    """C7: date/event-type partitioned layout; a filtered read must
    prune partitions (the filter shows as a partition filter, not a
    data filter)."""
    from ecommerce_analytics_spark.io import (load_table,
                                              write_partitioned_parquet)
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd"))
    lake = str(tmp_path / "lake")
    write_partitioned_parquet(events, lake,
                              partition_cols=("event_date", "event_type"))
    # directory layout is hive-style
    days = [d for d in os.listdir(lake) if d.startswith("event_date=")]
    assert days
    assert any(d.startswith("event_type=")
               for d in os.listdir(os.path.join(lake, days[0])))

    back = spark.read.parquet(lake)
    q = back.filter((F.col("event_type") == "purchase")
                    & (F.col("event_date") == days[0].split("=", 1)[1]))
    buf = pyio.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "isnotnull(event_type" in plan  # pruned, not scanned+filtered
    n = q.count()
    expected = events.filter(
        (F.col("event_type") == "purchase")
        & (F.col("event_date") == days[0].split("=", 1)[1])).count()
    assert n == expected


def test_compact_parquet(spark, sf_dir, tmp_path):
    """Lake compaction: many small files → few target-size files, same
    row multiset; sorted variant clusters for row-group skipping."""
    from ecommerce_analytics_spark.io import compact_parquet, load_table
    small = str(tmp_path / "small")
    events = load_table(spark, sf_dir, "events")
    events.repartition(23).write.mode("overwrite").parquet(small)
    import glob
    assert len(glob.glob(f"{small}/*.parquet")) == 23

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, small, out, target_file_mb=256,
                        sort_within=("ts",))
    assert n <= 2
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert back.select(F.sum("value")).collect()[0][0] == \
        pytest.approx(events.select(F.sum("value")).collect()[0][0])


def test_compaction_over_streaming_sink(spark, sf_dir, events_stream_dir,
                                        tmp_path):
    """End-to-end lake maintenance (VERDICT r3 #7): an actual
    Structured Streaming parquet sink produces one file per partition
    per micro-batch (the small-files problem a 100 TB deployment lives
    or dies by); compacting the sink output must cut the file count
    AND leave every query result over the table unchanged — row-level
    multiset and aggregates."""
    import glob

    from ecommerce_analytics_spark.io import compact_parquet
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    sink = str(tmp_path / "sink")
    q = (stream.repartition(8).writeStream.format("parquet")
         .option("path", sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    small = glob.glob(f"{sink}/*.parquet")
    assert len(small) >= 16  # 2 micro-batches × 8 partitions

    compacted = str(tmp_path / "compacted")
    n = compact_parquet(spark, sink, compacted, target_file_mb=256,
                        sort_within=("ts",))
    assert n == len(glob.glob(f"{compacted}/*.parquet")) < len(small)

    before = spark.read.parquet(sink)
    after = spark.read.parquet(compacted)
    assert sorted(map(tuple, before.collect())) == \
        sorted(map(tuple, after.collect()))
    # a representative rollup sees the identical table through either
    # layout (this is the invariant compaction exists to preserve)
    def rollup(df):
        return sorted(map(tuple, (
            df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 6).alias("v"))
            .collect())))
    assert rollup(before) == rollup(after)


def test_event_struct_json_edge(spark, sf_dir):
    """P11/P16: struct construction + ISO-string timestamps at the JSON
    edge, from_json(to_json(x)) == x."""
    from ecommerce_analytics_spark.io import load_table
    from pyspark.sql import types as T
    events = load_table(spark, sf_dir, "events").limit(50)
    struct_schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    built = events.select(
        "event_id", "ts",
        F.to_json(F.struct(
            F.col("event_id"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
            F.col("user_id"), F.col("value"))).alias("j"))
    back = built.select(
        "event_id", "ts", F.from_json("j", struct_schema).alias("e"))
    bad = back.filter(
        (F.col("e.event_id") != F.col("event_id"))
        | (F.col("e.timestamp")
           != F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")))
    assert bad.count() == 0


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """S8/C7 scale layout: lineitem and orders written bucketed on the
    join key with the same bucket count join with NO exchange and NO
    sort (sortBy pre-orders the files for the merge) — the co-located
    join that removes the warehouse's biggest shuffle at 100 TB."""
    from ecommerce_analytics_spark.io import load_table, write_bucketed_table
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    try:
        write_bucketed_table(li, "li_b", ("l_orderkey",), 4,
                             sort_cols=("l_orderkey",),
                             path=str(tmp_path / "li_b"))
        write_bucketed_table(od, "ord_b", ("o_orderkey",), 4,
                             sort_cols=("o_orderkey",),
                             path=str(tmp_path / "ord_b"))
        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == li.join(
            od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC sink → scan roundtrip; predicate pushdown reaches the ORC
    reader just like parquet."""
    from ecommerce_analytics_spark.io import load_table, read_orc, write_orc
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity")
    write_orc(li, str(tmp_path / "li_orc"))
    back = read_orc(spark, str(tmp_path / "li_orc"))
    assert back.count() == li.count()
    filtered = back.filter(F.col("l_returnflag") == "R")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_returnflag" in plan
    assert filtered.count() == li.filter(F.col("l_returnflag") == "R").count()


def test_read_evolving_parquet_merges_added_columns(spark, sf_dir,
                                                    tmp_path):
    """Batch 1 lacks a column batch 2 added; the merged scan exposes
    the union schema with NULLs for pre-evolution rows, and pruning/
    pushdown still work on the shared columns."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.io import (
        load_table, read_evolving_parquet,
    )

    out = str(tmp_path / "lake")
    orders = load_table(spark, sf_dir, "orders")
    (orders.filter(F.col("o_orderkey") % 2 == 0)
     .select("o_orderkey", "o_custkey", "o_totalprice")
     .write.mode("append").parquet(out))
    (orders.filter(F.col("o_orderkey") % 2 == 1)
     .select("o_orderkey", "o_custkey", "o_totalprice",
             F.col("o_orderpriority").alias("priority"))  # added later
     .write.mode("append").parquet(out))

    merged = read_evolving_parquet(spark, out)
    assert "priority" in merged.columns
    n = orders.count()
    assert merged.count() == n
    # pre-evolution rows surface NULL for the added column
    nulls = merged.filter(F.col("priority").isNull()).count()
    assert nulls == orders.filter(F.col("o_orderkey") % 2 == 0).count()
    # values intact across the evolution boundary
    assert (merged.agg(F.sum("o_orderkey")).first()[0]
            == orders.agg(F.sum("o_orderkey")).first()[0])


# ---------------------------------------------------------------------------
# Cross-run index cache hygiene (ADVICE r7 #1/#2): per-user 0700 root,
# mtime refresh on every hit, prune keep-guard for the key being
# resolved, ownership distrust. Pure-filesystem tests — no Spark.


def _fake_corpus(tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "embeddings.parquet").write_bytes(b"not-really-parquet")
    return str(sf)


def test_cache_root_is_per_user_and_0700(tmp_path, monkeypatch):
    import tempfile

    from ecommerce_analytics_spark import io as eio

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = _fake_corpus(tmp_path)
    dest = eio.cached_index_dir(sf, "t_fam", "tok",
                                lambda p: os.makedirs(p))
    uid = os.getuid()
    assert f"ea_cache_{uid}" in dest
    root = os.path.join(str(tmp_path), f"ea_cache_{uid}")
    assert (os.stat(root).st_mode & 0o777) == 0o700


def test_cache_hit_refreshes_mtime_and_never_rebuilds(tmp_path, monkeypatch):
    import tempfile

    from ecommerce_analytics_spark import io as eio

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = _fake_corpus(tmp_path)
    dest = eio.cached_index_dir(sf, "t_fam", "tok",
                                lambda p: os.makedirs(p))
    # age the entry past the prune horizon, then hit it again: the
    # builder must NOT run, and the hit must refresh mtime so a
    # concurrent prune can never see it as stale
    old = 1_000_000_000
    os.utime(dest, (old, old))

    def boom(_):
        raise AssertionError("builder ran on a cache hit")

    dest2 = eio.cached_index_dir(sf, "t_fam", "tok", boom)
    assert dest2 == dest
    assert os.path.getmtime(dest) > old


def test_prune_spares_the_key_being_resolved(tmp_path, monkeypatch):
    import tempfile

    from ecommerce_analytics_spark import io as eio

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = _fake_corpus(tmp_path)
    fam = os.path.join(eio._user_cache_root(), "t_fam")
    # a stale sibling entry AND a stale tmp tree for the key we are
    # about to resolve
    os.makedirs(os.path.join(fam, "stale_sibling"))
    old = 1_000_000_000
    os.utime(os.path.join(fam, "stale_sibling"), (old, old))

    seen = {}

    def build(p):
        os.makedirs(p)
        seen["built"] = True

    dest = eio.cached_index_dir(sf, "t_fam", "tok2", build)
    assert seen.get("built")
    # the stale sibling was pruned; the freshly-built key survives
    assert not os.path.isdir(os.path.join(fam, "stale_sibling"))
    assert os.path.isdir(dest)


def test_prune_keep_guard_unit(tmp_path):
    from ecommerce_analytics_spark.io import _prune_stale_cache_entries

    fam = tmp_path / "fam"
    fam.mkdir()
    old = 1_000_000_000
    for name in ("keepme", "keepme.tmp123", "goner"):
        d = fam / name
        d.mkdir()
        os.utime(d, (old, old))
    _prune_stale_cache_entries(str(fam), keep="keepme")
    assert (fam / "keepme").is_dir()
    assert (fam / "keepme.tmp123").is_dir()
    assert not (fam / "goner").exists()


def test_unowned_cache_entry_is_distrusted(tmp_path, monkeypatch):
    import tempfile

    from ecommerce_analytics_spark import io as eio

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = _fake_corpus(tmp_path)
    dest = eio.cached_index_dir(sf, "t_fam", "tok3",
                                lambda p: os.makedirs(p))
    # simulate a foreign-owned entry: patch the ownership check itself
    # (cannot chown cross-uid in tests); the entry must be rebuilt
    monkeypatch.setattr(eio, "_owned_by_me", lambda p: False)
    rebuilt = {}

    def build(p):
        os.makedirs(p)
        rebuilt["yes"] = True

    dest2 = eio.cached_index_dir(sf, "t_fam", "tok3", build)
    assert dest2 == dest and rebuilt.get("yes")


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
