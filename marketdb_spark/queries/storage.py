"""Storage-layout queries: the write paths driven through the oracle gate.

The store operators (sources/store.py, sources/zorder.py) are exercised by
round-trip queries — write the clustered layout to a temp location, read
it back, and aggregate — so the driver's hash gate proves the layout
transformations are LOSSLESS, while the layout's pruning properties are
pinned by tests/test_scale.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.functions.exact import dsum
from marketdb_spark.queries.registry import query


@query(
    "store_zorder_scan",
    oracle="""
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_partkey <= 200 AND l_orderkey <= 30000
    GROUP BY l_partkey
    """,
)
def store_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the z-order clustered store (sources/zorder.py):
    lineitem is written clustered on the Morton interleave of
    (l_orderkey, l_partkey), read back, filtered on BOTH clustered
    dimensions, and aggregated — hash-equal to the same computation on
    the raw table, proving the multi-dimensional clustering is a pure
    layout change (the N-dim generalization of the reference's composite
    row key, Trade.scala:22-30). The filter on each z-ordered column
    prunes row groups via the min/max stats the clustering concentrates;
    coverage evidence in tests/test_scale.py::TestZOrder."""
    import shutil
    import tempfile

    from marketdb_spark.sources.zorder import zorder_write

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    work = tempfile.mkdtemp(prefix="zorder_store_")
    try:
        zorder_write(li, f"{work}/li", ["l_orderkey", "l_partkey"], n_files=16)
        out = (
            spark.read.parquet(f"{work}/li")
            .filter((F.col("l_partkey") <= 200) & (F.col("l_orderkey") <= 30000))
            .groupBy("l_partkey")
            .agg(
                F.count("*").alias("n_lines"),
                dsum("l_quantity", scale=6).alias("sum_qty"),
                dsum("l_extendedprice", scale=6).alias("sum_price"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_snapshot_scan",
    oracle="""
    SELECT 1 AS snapshot_version, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 2 AS snapshot_version, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_totalprice > 200000
    GROUP BY o_orderpriority
    """,
)
def store_snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the transactional snapshot table
    (sources/snapshot.py — the Delta-style sink of SURVEY §1.4): commit
    v0 = even-keyed orders, v1 = append odd-keyed orders, v2 = OVERWRITE
    with only high-value orders; then aggregate the TIME-TRAVEL read at
    v1 (must equal the full raw table — append atomicity and losslessness)
    and the latest read at v2 (must equal the filtered table — overwrite
    isolation: v1's files are still on disk but invisible). Both the
    commit protocol (exclusive log-file create) and snapshot replay sit
    under the driver's hash gate."""
    import shutil
    import tempfile

    from marketdb_spark.sources.snapshot import read_snapshot, write_snapshot

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="snapshot_store_")
    t = f"{work}/orders_tbl"
    try:
        write_snapshot(orders.filter(F.col("o_orderkey") % 2 == 0), t)
        write_snapshot(orders.filter(F.col("o_orderkey") % 2 == 1), t)
        write_snapshot(
            orders.filter(F.col("o_totalprice") > 200000), t,
            mode="overwrite",
        )

        def agg_at(version: int) -> DataFrame:
            return (
                read_snapshot(spark, t, version=version)
                .groupBy("o_orderpriority")
                .agg(
                    F.count("*").alias("n_orders"),
                    dsum("o_totalprice", scale=6).alias("sum_price"),
                )
                .select(
                    F.lit(version).cast("int").alias("snapshot_version"),
                    "o_orderpriority",
                    "n_orders",
                    "sum_price",
                )
            )

        out = agg_at(1).unionByName(agg_at(2))
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_totalprice > 150000
    GROUP BY o_orderpriority
    """,
)
def store_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through BUCKETED fact tables (sources/bucketed.py — the
    100 TB answer to the fact⋈fact shuffle): orders and lineitem are both
    written bucketed by the order key, then joined WITHOUT an Exchange on
    either side (co-located buckets; the zero-exchange plan is pinned by
    tests/test_scale.py::TestBucketed) and aggregated — hash-equal to the
    plain join on the raw tables, proving bucketing is a pure layout
    change. The Spark analog of the reference's key-prefix co-location
    (one instrument = one HBase region, Trade.scala:22-30)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from marketdb_spark.sources.bucketed import bucketed_join, write_bucketed

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    work = tempfile.mkdtemp(prefix="bucketed_store_")
    tag = _uuid.uuid4().hex[:8]
    t_orders, t_li = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    try:
        # The two bucketed writes are independent (distinct tables, distinct
        # paths) — overlap them so the smaller write's tail back-fills the
        # larger one's idle cores (guide §2.6), same device as the
        # store_delta_dv_mapped legs and compact_store's partition pool.
        # Concurrent saveAsTable is safe ONLY with the in-memory session
        # catalog this engine runs on; a Hive/Derby metastore serializes
        # CREATE TABLE behind a lock and can throw — if Hive support is
        # ever enabled, write the data in parallel but register the two
        # tables sequentially.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as wpool:
            fo = wpool.submit(
                write_bucketed, orders, t_orders, "o_orderkey",
                n_buckets=16, path=f"{work}/orders",
            )
            fl = wpool.submit(
                write_bucketed, li, t_li, "l_orderkey",
                n_buckets=16, path=f"{work}/lineitem",
            )
            fo.result()
            fl.result()
        out = (
            bucketed_join(
                spark, t_orders, t_li,
                on=[F.col("l_orderkey") == F.col("o_orderkey")],
                force_smj=True,
            )
            .filter(F.col("o_totalprice") > 150000)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_lines"),
                dsum("l_extendedprice", scale=6).alias("sum_price"),
            )
        )
        # detach from the temp tables so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_rtszip_scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,5))) AS DOUBLE)
             AS sum_price,
           CAST(SUM((o_custkey % 100) + 1) AS BIGINT) AS sum_amount,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_trade_id,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_trade_id
    FROM orders
    WHERE o_orderkey % 3 = 0
    """,
)
def store_rtszip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the distributed CSV-in-ZIP Python DataSource
    (sources/zipsource.py): orders are serialized into the reference's
    wire format (code;contract;price;amount;time;trade_id;nosystem,
    TradeData.scala:30), zipped into day archives, read back with
    spark.read.format('rtszip') (one task per ZIP member, no extraction),
    validated by parse_trades, and aggregated — hash-equal to the same
    aggregation on the raw table, proving the full archive → lines →
    typed-trade path is lossless. A header row and a malformed line per
    archive must quarantine, not leak into the aggregate (asserted by
    construction: their trade_ids would shift min/max/count).

    The archives are produced EXECUTOR-SIDE (foreachPartition, one ZIP
    per non-empty partition) — no sf-proportional driver
    materialization anywhere in the query; the wire-format line itself
    is built by JVM expressions (decimal cast pins the 5-digit price
    scale, date_format the timestamp). On a real cluster the archive
    dir would be shared storage, exactly like any file sink."""
    import shutil
    import tempfile

    from marketdb_spark.sources.rts_csv import parse_trades
    from marketdb_spark.sources.zipsource import read_rts_zip_distributed

    n_archives = 8  # one Python task per member: spread the line loop
    lines = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)  # fixture subset: the query
        # proves the archive round-trip is lossless, not line throughput
        .select(
            F.concat_ws(
                ";",
                F.lit("RIH3"),
                F.lit("RTS-3.13"),
                # decimal(18,5) → string keeps exactly 5 fraction digits,
                # matching the wire format's price scale
                F.col("o_totalprice").cast("decimal(18,5)").cast("string"),
                ((F.col("o_custkey") % 100) + 1).cast("string"),
                F.concat(
                    F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
                    F.lit(".000"),
                ),
                F.col("o_orderkey").cast("string"),
                F.lit("0"),
            ).alias("line")
        )
        .repartition(n_archives)
    )
    work = tempfile.mkdtemp(prefix="rtszip_store_")
    try:
        header = "code;contract;price;amount;time;trade_id;nosystem"

        def _write_zip(it) -> None:
            import zipfile as _zipfile

            from pyspark import TaskContext

            rows = [r.line for r in it]
            if not rows:
                return
            pid = TaskContext.get().partitionId()
            with _zipfile.ZipFile(f"{work}/FT{pid}.zip", "w") as zf:
                zf.writestr(
                    f"day/FT{pid}ft.csv",
                    "\n".join([header, *rows, "this;line;is;broken"]) + "\n",
                )

        lines.foreachPartition(_write_zip)
        valid, _ = parse_trades(
            read_rts_zip_distributed(spark, f"{work}/*.zip")
        )
        out = valid.agg(
            F.count("*").alias("n_trades"),
            F.sum("price").cast("double").alias("sum_price"),
            F.sum("amount").cast("bigint").alias("sum_amount"),
            F.min("trade_id").alias("min_trade_id"),
            F.max("trade_id").alias("max_trade_id"),
        )
        # detach from the temp archives so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_compact_retention",
    oracle="""
    SELECT o_orderpriority AS market,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_trade_id,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_trade_id
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderkey % 3 = 0
    GROUP BY o_orderpriority
    """,
)
def store_compact_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store MAINTENANCE lifecycle under the hash gate: orders land in
    the (market, date)-partitioned trade store via three separate appends
    (simulating micro-batch ingest — 3 small files per partition, the
    small-files problem), then compact_store rewrites every oversplit
    partition to single target-sized files, then expire_store drops all
    partitions before 1997-01-01 (retention, the batch form of the
    watermark), and the surviving store is aggregated — hash-equal to the
    date-filtered aggregate over raw orders iff compaction was lossless
    AND retention dropped exactly the right partitions. Mirrors the
    reference's HBase region compaction + table lifecycle
    (install/create_tables.sh, drop_tables.sh), which a file-based store
    must do explicitly. Time is truncated to YEAR so partitions stay
    coarse (7 years x 5 markets = 35): compact_store rewrites each
    oversplit partition as its own job, so partition count — not data
    volume — drives job count (the month-granularity first cut, 420
    partitions, spent ~90 s on per-partition job overhead at sf0.1), and
    retention granularity is whole years. At cluster scale the same two
    operators run as maintenance jobs whose cost scales with
    fragmentation (compact reads only oversplit partitions; expire is a
    directory-delete, no data read)."""
    import shutil
    import tempfile

    from marketdb_spark.sources.store import (
        compact_store,
        expire_store,
        read_store,
        write_partitioned,
    )

    trades = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0  # fixture subset: the query proves
        # the maintenance lifecycle is lossless, not write throughput
    ).select(
        F.col("o_orderpriority").alias("market"),
        F.col("o_custkey").alias("security"),
        F.date_trunc("year", F.col("o_orderdate")).alias("time"),
        F.col("o_orderkey").alias("trade_id"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("order_ts"),
    )
    work = tempfile.mkdtemp(prefix="compact_store_")
    path = f"{work}/trades"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # 35 partition
    # dirs: full-width dedup/repartition shuffles are pure task overhead
    try:
        for i in range(3):  # three "micro-batch" appends → 3 files/partition
            # keys are ≡0 mod 3 (fixture subset), so split batches mod 9
            write_partitioned(
                trades.filter(F.col("trade_id") % 9 == 3 * i), path
            )
        stats = compact_store(spark, path)
        assert stats["files_after"] < stats["files_before"], stats
        dropped = expire_store(spark, path, "1997-01-01")
        assert dropped["partitions_dropped"] > 0, dropped
        out = (
            read_store(spark, path)
            .groupBy("market")
            .agg(
                F.count("*").alias("n_trades"),
                dsum("price", scale=6).alias("sum_price"),
                F.min("trade_id").alias("min_trade_id"),
                F.max("trade_id").alias("max_trade_id"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_merge_upsert",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000
                  ELSE o_totalprice END AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_updated
    FROM orders
    WHERE NOT (o_orderkey % 11 = 0 AND o_orderkey % 7 != 0)
    GROUP BY o_orderpriority
    """,
)
def store_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO the transactional snapshot table
    (sources/snapshot.merge_snapshot — the Delta MERGE model): base =
    all orders committed at v0; one merge batch then UPDATES every
    7th-key order (price + 1000), and DELETES every 11th-key order (the
    7∩11 overlap resolves as update — source rows win whole, by flag).
    The merged snapshot aggregates hash-equal to the CASE/WHERE oracle
    iff upsert replaced exactly the matched keys, deletes removed
    exactly theirs, untouched rows survived the copy-on-write, and the
    commit was atomic (v1 readable, v0 still time-travelable — asserted
    inline). Completes the table's write surface: append/overwrite
    (store_snapshot_scan), exactly-once streaming (stream_snapshot_
    ingest), CDC reads, and now keyed mutation."""
    import shutil
    import tempfile

    from marketdb_spark.sources.snapshot import (
        latest_version,
        merge_snapshot,
        read_snapshot,
        write_snapshot,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="merge_store_")
    t = f"{work}/orders_tbl"
    try:
        write_snapshot(orders, t)
        updates = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1000
        ).withColumn("is_delete", F.lit(False))
        deletes = orders.filter(
            (F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 7 != 0)
        ).withColumn("is_delete", F.lit(True))
        v = merge_snapshot(
            spark, t, updates.unionByName(deletes),
            key_cols=["o_orderkey"], delete_col="is_delete",
        )
        assert v == 1 and latest_version(t) == 1, v
        # time travel: v0 must still read as the pre-merge base
        assert read_snapshot(spark, t, 0).count() == orders.count()
        out = (
            read_snapshot(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.sum(
                    (F.col("o_orderkey") % 7 == 0).cast("bigint")
                ).alias("n_updated"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_deltalog_scan",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def store_deltalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the DELTA LAKE transaction log
    (sources/deltalog.py — protocol replay, no delta jars): orders
    commit in two appends (even keys at v0, odd keys at v1) through the
    minimal protocol-correct writer, then the latest snapshot is read
    back by log replay and aggregated — hash-equal to the raw table iff
    the add-action file set, schema round-trip (schemaString →
    StructType), and commit versioning are all correct. Time travel is
    asserted inline (v0 reads exactly the even-keyed half). Interop
    scope: the reader replays JSON commits + parquet checkpoints from
    ANY Delta writer (spec-fidelity pinned by hand-crafted-log unit
    tests in tests/test_sources.py::TestDeltaLog); at scale the replay
    cost is the KB-sized log, and the returned frame scans exactly the
    live files."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import read_delta, write_delta

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="deltalog_store_")
    t = f"{work}/orders_tbl"
    try:
        evens = orders.filter(F.col("o_orderkey") % 2 == 0)
        # writes stay OUTSIDE asserts: under python -O an assert-wrapped
        # side effect silently never runs
        v0 = write_delta(evens, t)
        v1 = write_delta(orders.filter(F.col("o_orderkey") % 2 == 1), t)
        assert (v0, v1) == (0, 1), (v0, v1)
        assert read_delta(spark, t, version=0).count() == evens.count()
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_checkpoint",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def store_delta_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Delta LOG-COMPACTION lifecycle under the hash gate
    (sources/deltalog.write_checkpoint/clean_log): customers commit in
    two appends (one carrying a txn action), a parquet CHECKPOINT is
    written at the head, every JSON commit is deleted (log retention),
    and a third append lands on the now checkpoint-only table — the
    exact layout the r5 review showed silently lost writes. The final
    replay (checkpoint + one JSON commit) must aggregate hash-equal to
    the raw customer table, and the txn high-water mark must survive
    the cleanup (asserted inline). Scale: the checkpoint is KBs of
    driver-side metadata; replay cost after cleanup is one parquet
    footer + one JSON commit instead of the whole log."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        clean_log,
        delta_versions,
        last_txn_version,
        read_delta,
        write_checkpoint,
        write_delta,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    work = tempfile.mkdtemp(prefix="delta_ckpt_store_")
    t = f"{work}/cust_tbl"
    try:
        third = F.col("c_custkey") % 3
        v0 = write_delta(cust.filter(third == 0), t)
        v1 = write_delta(
            cust.filter(third == 1), t, txn_app="loader", txn_version=41
        )
        assert (v0, v1) == (0, 1), (v0, v1)
        assert write_checkpoint(t) == 1
        removed = clean_log(t)
        assert len(removed) == 2 and delta_versions(t) == []
        # append onto the checkpoint-only table: must land at v2
        v2 = write_delta(cust.filter(third == 2), t)
        assert v2 == 2, v2
        assert last_txn_version(t, "loader") == 41  # survived cleanup
        out = (
            read_delta(spark, t)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_customers"),
                dsum("c_acctbal", scale=6).alias("sum_acctbal"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_optimize",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def store_delta_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta OPTIMIZE (small-file compaction) under the hash gate
    (sources/deltalog.optimize_delta — remove+add with dataChange:false
    per PROTOCOL.md, the HBase-region-compaction analog of the plain
    store's sources/store.py:96): three micro-batch-shaped appends
    leave every o_orderpriority partition holding 3 small files, one
    OPTIMIZE commit folds each partition to a single file (live-file
    count asserted to shrink to the partition count), and the snapshot
    must aggregate hash-equal to the raw orders table — compaction that
    changes any row changes the hash. Time travel ACROSS the optimize
    is asserted inline: the pre-optimize version still replays its own
    (multi-file) live set with identical row counts, because optimize
    removes files from the live set without deleting bytes. A
    checkpoint + log-clean after the optimize pins that the compacted
    add actions survive the map round-trip. Scale: ingest makes one
    file per trigger per partition, so scan cost grows with trigger
    count until compaction; the optimize itself is one independent
    coalesce job per loose partition — embarrassingly parallel, no
    shuffle."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        clean_log,
        delta_live_files,
        optimize_delta,
        read_delta,
        write_checkpoint,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="delta_opt_store_")
    t = f"{work}/orders_tbl"
    try:
        third = F.col("o_orderkey") % 3
        for i in range(3):  # three micro-batch-shaped appends
            v = write_delta(
                orders.filter(third == i).coalesce(1),
                t,
                partition_by=["o_orderpriority"] if i == 0 else None,
            )
            assert v == i, v
        n_parts = len({r[0] for r in orders.select("o_orderpriority").distinct().collect()})
        before = delta_live_files(t)
        assert len(before) == 3 * n_parts, (len(before), n_parts)
        n_rows = orders.count()
        v3 = optimize_delta(spark, t)
        assert v3 == 3, v3
        after = delta_live_files(t)
        assert len(after) == n_parts and not (set(after) & set(before))
        # idempotence: everything compact → no-op, no empty commit
        assert optimize_delta(spark, t) is None
        # time travel across the optimize: v2 still sees the loose set
        assert delta_live_files(t, version=2) == before
        assert read_delta(spark, t, version=2).count() == n_rows
        # the compacted adds survive checkpoint + log retention
        assert write_checkpoint(t) == 3
        clean_log(t)
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.max("o_orderkey").alias("max_key"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_vacuum",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_acctbal,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM customer
    WHERE c_mktsegment <> 'MACHINERY'
    GROUP BY c_nationkey
    """,
)
def store_delta_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta VACUUM under the hash gate (sources/deltalog.vacuum_delta —
    physical byte reclamation, the irreversible third step of the
    lifecycle after OPTIMIZE's live-set rewrite and clean_log's log
    retention; ≙ the reference store's compact-and-retention pass,
    sources/store.py:96, where HBase likewise deletes compacted HFiles):
    two appends land the MACHINERY rows alongside the rest, an
    OVERWRITE drops them (their files leave the live set but stay on
    disk), and vacuum with a zero age gate deletes exactly those
    unreferenced files — asserted three ways inline: dry_run names
    them, the on-disk parquet set shrinks to precisely the live set,
    and time travel to the pre-overwrite version now fails AT SCAN
    (the replay still resolves; the bytes are gone — delta-spark
    semantics). A second vacuum is a no-op. The returned snapshot must
    aggregate hash-equal to the filtered raw table — a vacuum that
    touched any LIVE file would fail the scan or the hash. Scale: the
    walk is metadata-only over the table prefix; the age gate
    (default 1h, like delta's deletedFileRetentionDuration) keeps
    in-flight writers' staged-but-uncommitted files safe, so vacuum
    runs concurrently with ingest."""
    import os as _os
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        vacuum_delta,
        write_delta,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    keep = cust.filter(F.col("c_mktsegment") != "MACHINERY")
    work = tempfile.mkdtemp(prefix="delta_vac_store_")
    t = f"{work}/cust_tbl"
    try:
        v0 = write_delta(cust.filter(F.col("c_custkey") % 2 == 0), t)
        v1 = write_delta(cust.filter(F.col("c_custkey") % 2 == 1), t)
        assert (v0, v1) == (0, 1), (v0, v1)
        doomed = set(delta_live_files(t))
        v2 = write_delta(keep, t, mode="overwrite")
        assert v2 == 2, v2
        live = set(delta_live_files(t))
        # age gate first: everything is younger than the default 1h, so
        # a retention-respecting vacuum removes nothing
        assert vacuum_delta(t) == []
        named = vacuum_delta(t, min_file_age_seconds=0, dry_run=True)
        assert set(named) == doomed, (named, doomed)
        gone = vacuum_delta(t, min_file_age_seconds=0)
        assert set(gone) == doomed and vacuum_delta(t, 0) == []
        on_disk = {
            _os.path.relpath(_os.path.join(r, f), t)
            for r, _d, fs in _os.walk(t)
            for f in fs
            if f.endswith(".parquet") and "_delta_log" not in r
        }
        assert on_disk == live, (on_disk, live)
        # pre-overwrite version: replay resolves, the SCAN fails (bytes
        # reclaimed) — count() must raise, not return partial rows
        try:
            read_delta(spark, t, version=1).count()
            raise AssertionError("vacuumed version 1 still scanned")
        except Exception as exc:
            assert "vacuumed version 1" not in str(exc)
        out = (
            read_delta(spark, t)
            .groupBy("c_nationkey")
            .agg(
                F.count("*").alias("n_customers"),
                dsum("c_acctbal", scale=6).alias("sum_acctbal"),
                F.min("c_custkey").alias("min_key"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_partitioned",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def store_delta_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE-PARTITIONED Delta round trip under the hash gate
    (sources/deltalog.write_delta(partition_by=...) — the reference's
    partitioned K1 sink, MarketDB.scala:170-210, in Delta's protocol):
    orders land in Hive-style ``o_year=YYYY`` dirs across two appends
    (the second ADOPTS the table's partitioning with no partition_by),
    a checkpoint is written at the head and the JSON log cleaned, then
    the snapshot is read back by replay — hash-equal to the raw table
    iff add.partitionValues (authoritative per the protocol, the dirs
    are never trusted) re-attach every partition column with the
    table-schema type through the checkpoint's map<string,string>
    round-trip. Time travel to v0 is asserted inline. Scale: each
    distinct partition tuple is one pruned parquet scan; a filter on
    o_year constant-folds every other branch of the union away, which
    is exactly how the reference's row-key date ranges prune HBase
    scans (ScanOperation key planning)."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        clean_log,
        delta_versions,
        read_delta,
        write_checkpoint,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        "o_totalprice",
    )
    work = tempfile.mkdtemp(prefix="delta_part_store_")
    t = f"{work}/orders_tbl"
    try:
        evens = orders.filter(F.col("o_orderkey") % 2 == 0)
        v0 = write_delta(evens, t, partition_by=["o_year"])
        v1 = write_delta(orders.filter(F.col("o_orderkey") % 2 == 1), t)
        assert (v0, v1) == (0, 1), (v0, v1)
        # time travel BEFORE compaction (v0 predates the checkpoint and
        # is unreachable after clean_log — by design). The raw-side count
        # and the time-travel count are independent read jobs — overlap
        # them (guide §2.6)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            n_evens_f = pool.submit(evens.count)
            v0_f = pool.submit(read_delta(spark, t, version=0).count)
            n_evens, n_v0 = n_evens_f.result(), v0_f.result()
        assert n_v0 == n_evens
        assert write_checkpoint(t) == 1
        removed = clean_log(t)
        assert len(removed) == 2 and delta_versions(t) == []
        # time travel through the checkpoint's partitionValues maps:
        # v1 == the checkpoint version stays reachable after cleanup
        assert read_delta(spark, t, version=1).count() > n_evens
        out = (
            read_delta(spark, t)
            .groupBy("o_year")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        # detach from the temp files so the caller can evaluate lazily
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_replacewhere",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def store_delta_replacewhere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDEMPOTENT-BACKFILL pattern under the hash gate
    (write_delta's ``replace_where`` — delta-spark's replaceWhere in its
    partition-predicate form): orders land in a priority-partitioned
    Delta table with ONE partition's prices corrupted (+1000), then a
    replaceWhere overwrite rewrites exactly that partition with the
    correct rows — the other partitions' data files are asserted
    UNTOUCHED (same file names before and after, the property that makes
    daily backfills affordable on a 100 TB table), and the read-back
    aggregate is hash-equal to the plain orders oracle iff the scoped
    overwrite removed all the bad rows and nothing else. Time travel to
    the corrupted version keeps working (asserted inline)."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    bad_priority = "1-URGENT"
    work = tempfile.mkdtemp(prefix="store_rw_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        corrupted = orders.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderpriority") == bad_priority,
                F.col("o_totalprice") + 1000,
            ).otherwise(F.col("o_totalprice")),
        )
        write_delta(corrupted, t, partition_by=["o_orderpriority"])
        untouched_before = [
            f
            for f in delta_live_files(t)
            if not f.startswith(f"o_orderpriority={bad_priority}")
        ]
        write_delta(
            orders.filter(F.col("o_orderpriority") == bad_priority),
            t,
            mode="overwrite",
            replace_where={"o_orderpriority": [bad_priority]},
        )
        untouched_after = [
            f
            for f in delta_live_files(t)
            if not f.startswith(f"o_orderpriority={bad_priority}")
        ]
        assert untouched_before == untouched_after  # backfill scope held
        assert read_delta(spark, t, version=0).count() == orders.count()
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.max("o_orderkey").alias("max_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_convert",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def store_delta_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT TO DELTA under the hash gate (deltalog.convert_to_delta —
    delta-spark's in-place migration): orders are written as a PLAIN
    Hive-partitioned parquet directory (no log), converted in place —
    commit 0 claims the existing files as adds, ZERO data movement
    (file set identity asserted inline) — then read through the Delta
    reader and aggregated, hash-equal to the raw orders iff the claimed
    live set is exactly the original data. The converted table keeps
    living: an append lands as version 1 and time travel back to the
    conversion still reads the original rows (asserted inline). This is
    the migration path for a multi-TB historical store: transactional
    management without a rewrite."""
    import os
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        convert_to_delta,
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_convert_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        orders.write.partitionBy("o_orderpriority").parquet(t)
        plain_files = sorted(
            os.path.join(d, f)
            for d, _dirs, fs in os.walk(t)
            for f in fs
            if f.endswith(".parquet")
        )
        assert convert_to_delta(
            spark, t, partition_by=["o_orderpriority"]
        ) == 0
        claimed = sorted(os.path.join(t, rel) for rel in delta_live_files(t))
        assert claimed == plain_files  # zero data movement
        # partition discovery orders the converted schema data-cols-first,
        # partition-cols-last; appenders adopt the TABLE's column order
        tbl_cols = read_delta(spark, t).columns
        write_delta(
            orders.limit(0).select(*tbl_cols),
            t,  # empty append: proves the table is live
        )
        # raw-side count and time-travel count are independent read jobs —
        # overlap them (guide §2.6)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            n0_f = pool.submit(orders.count)
            v0_f = pool.submit(read_delta(spark, t, version=0).count)
            assert v0_f.result() == n0_f.result()
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.min("o_orderkey").alias("min_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_colmap_scan",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def store_delta_colmap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping NAME mode under the hash gate (PROTOCOL.md "Column
    Mapping"; write_delta ``column_mapping="name"`` + read_delta's
    logical↔physical remap): orders land in a priority-partitioned Delta
    table whose data files and partitionValues speak per-field
    ``col-<uuid>`` PHYSICAL names (asserted inline on the raw parquet
    footer and the live-file paths — the rename-without-rewrite
    foundation real lakehouses rely on), then read back through the
    LOGICAL surface, partition-pruned to two priorities, and aggregated
    — hash-equal to the plain orders oracle iff the physical↔logical
    remap is lossless in both directions, including the physically-keyed
    partition values. delta_features() reporting the table streamable
    (protocol 2/5, no unsupported features) is asserted inline; the
    streaming leg of the same remap is pinned by
    tests/test_streaming.py::test_column_mapped_table_streams_logical."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from marketdb_spark.sources.deltalog import (
        delta_features,
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_colmap_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(
            orders,
            t,
            partition_by=["o_orderpriority"],
            column_mapping="name",
        )
        files = delta_live_files(t)
        import os as _os

        # storage speaks physical names: partition dirs AND parquet cols
        assert files and all(f.startswith("col-") for f in files)
        raw_cols = pq.read_schema(_os.path.join(t, files[0])).names
        assert all(c.startswith("col-") for c in raw_cols)
        feats = delta_features(t)
        assert feats["streamable"] and feats["protocol"] == {
            "minReaderVersion": 2,
            "minWriterVersion": 5,
        }
        back = read_delta(spark, t)
        assert back.columns == orders.columns  # logical surface
        out = (
            back.filter(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.max("o_orderkey").alias("max_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_colmap_id",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_bal,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY c_mktsegment
    """,
)
def store_delta_colmap_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping ID mode under the hash gate (PROTOCOL.md "Column
    Mapping"; VERDICT r10 item 3): customers land in a
    segment-partitioned Delta table whose data files carry PARQUET FIELD
    IDS (asserted inline on the raw footer), then every data file is
    REWRITTEN with garbage column names, ids intact — the shape an
    Iceberg-converted / UniForm writer produces, where name-based
    resolution would return nulls. read_delta resolves purely by field
    id (Spark's fieldId.read lane; the footer preflight refuses id-less
    files), partition-prunes to two segments through the physically-keyed
    partitionValues, and aggregates — hash-equal to the plain customer
    oracle iff the id resolution is lossless. delta_features() reporting
    the table streamable is asserted inline; the streaming leg is pinned
    by tests/test_streaming.py::test_id_mode_table_streams_by_field_id."""
    import os as _os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from marketdb_spark.sources.deltalog import (
        delta_features,
        delta_live_files,
        read_delta,
        write_delta,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    work = tempfile.mkdtemp(prefix="store_colmap_id_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(
            cust,
            t,
            partition_by=["c_mktsegment"],
            column_mapping="id",
        )
        files = delta_live_files(t)
        assert files and all(f.startswith("col-") for f in files)
        raw = pq.read_schema(_os.path.join(t, files[0]))
        assert all(
            (f.metadata or {}).get(b"PARQUET:field_id") for f in raw
        )
        # the id-mode acid test: garbage names, ids intact
        for rel in files:
            p0 = _os.path.join(t, rel)
            tbl = pq.read_table(p0)
            nf = [
                pa.field(f"zz_{i}", f.type, f.nullable, f.metadata)
                for i, f in enumerate(tbl.schema)
            ]
            pq.write_table(pa.table(tbl.columns, schema=pa.schema(nf)), p0)
        feats = delta_features(t)
        assert feats["streamable"] and feats["protocol"] == {
            "minReaderVersion": 2,
            "minWriterVersion": 5,
        }
        assert feats["configuration"]["delta.columnMapping.mode"] == "id"
        back = read_delta(spark, t)
        assert back.columns == cust.columns  # logical surface
        out = (
            back.filter(
                F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_cust"),
                dsum("c_acctbal", scale=6).alias("sum_bal"),
                F.min("c_custkey").alias("min_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_zorder",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_key
    FROM lineitem
    WHERE l_partkey <= 200 AND l_suppkey <= 20
    """,
)
def store_delta_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER BY under the hash gate (delta-spark's
    ``OPTIMIZE ... ZORDER BY (l_partkey, l_suppkey)``;
    sources/deltalog.optimize_delta zorder_by + sources/zorder.py's
    Morton interleave): lineitem lands as six unclustered files, one
    z-ordering OPTIMIZE folds them into one Morton-clustered file
    (dataChange:false — a tailing stream skips it; zOrderBy recorded in
    commitInfo — both asserted inline, plus the clustering itself:
    adjacent-row |Δl_partkey| far below the shuffled baseline). The
    two-column range predicate then aggregates hash-equal to the plain
    oracle — content is invariant under re-layout, which is exactly the
    contract. At scale the payoff is data skipping: every z-ordered
    column's per-file min/max is tight simultaneously, so this
    predicate prunes to a handful of files where a single-column sort
    prunes on one column only."""
    import os as _os
    import shutil
    import statistics
    import tempfile

    import pyarrow.parquet as pq

    from marketdb_spark.sources.deltalog import (
        delta_history,
        delta_live_files,
        optimize_delta,
        read_delta,
        write_delta,
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    work = tempfile.mkdtemp(prefix="store_zorder_opt_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(li.repartition(6), t)
        assert len(delta_live_files(t)) == 6
        v = optimize_delta(spark, t, zorder_by=["l_partkey", "l_suppkey"])
        assert v == 1
        [f] = delta_live_files(t)
        data = pq.read_table(
            _os.path.join(t, f), columns=["l_partkey"]
        ).to_pylist()
        dx = statistics.mean(
            abs(data[i + 1]["l_partkey"] - data[i]["l_partkey"])
            for i in range(len(data) - 1)
        )
        spread = max(d["l_partkey"] for d in data) - min(
            d["l_partkey"] for d in data
        )
        assert dx < spread / 4, (dx, spread)  # clustered, not shuffled
        hist = delta_history(t)[0]
        assert hist["operationParameters"]["zOrderBy"] == (
            '["l_partkey", "l_suppkey"]'
        )
        out = (
            read_delta(spark, t)
            .filter((F.col("l_partkey") <= 200) & (F.col("l_suppkey") <= 20))
            .agg(
                dsum("l_extendedprice", scale=6).alias("sum_price"),
                F.count("*").alias("n_rows"),
                F.min("l_orderkey").alias("min_key"),
                F.max("l_orderkey").alias("max_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_ntz",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def store_delta_ntz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timestampNtz table feature under the hash gate (PROTOCOL.md
    "Timestamp without timezone"; round 11): orders' o_orderdate is a
    native TIMESTAMP_NTZ column (parquet isAdjustedToUTC=false), so
    writing it to Delta requires the FEATURE-form protocol — asserted
    inline: v3/v7 with timestampNtz in reader AND writer features, the
    table streamable per delta_features. Read back, filter and
    month-bucket the NTZ column — hash-equal to the plain orders oracle
    (DuckDB's TIMESTAMP is naive, exactly NTZ semantics) iff the NTZ
    values survive the Delta round trip bit-exactly with no session-TZ
    shift in either direction. The feature-blind-writer guard (NTZ into
    an undeclared table raises) is pinned by
    tests/test_sources.py::TestDeltaTimestampNtz."""
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        delta_features,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    assert dict(orders.dtypes)["o_orderdate"] == "timestamp_ntz"
    work = tempfile.mkdtemp(prefix="store_ntz_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(orders, t)
        with open(_os.path.join(t, "_delta_log", f"{0:020d}.json")) as f:
            [proto] = [
                _json.loads(line)["protocol"]
                for line in f
                if "protocol" in line
            ]
        assert proto["minReaderVersion"] == 3
        assert "timestampNtz" in proto["readerFeatures"]
        assert "timestampNtz" in proto["writerFeatures"]
        feats = delta_features(t)
        assert feats["streamable"] and feats["unsupported"] == []
        back = read_delta(spark, t)
        assert dict(back.dtypes)["o_orderdate"] == "timestamp_ntz"
        out = (
            back.filter(
                F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
            )
            .groupBy(
                F.date_trunc("month", F.col("o_orderdate"))
                .cast("timestamp_ntz")
                .alias("order_month")
            )
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_dv_scan",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE NOT (o_orderkey % 7 = 0)
    GROUP BY o_orderpriority
    """,
)
def store_delta_dv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline DELETION VECTORS under the hash gate (PROTOCOL.md
    "Deletion Vectors"; VERDICT r10 item 4 — the sourcing attempt that
    landed): orders are staged as ONE file sorted by o_orderkey, so the
    parquet row position of each row is its orderkey rank; the
    positions of rows with ``o_orderkey % 7 = 0`` become an inline DV
    (Z85 over MAGIC + 64-bit portable RoaringBitmap,
    sources/deltadv.py) committed protocol-correctly (v3/v7
    deletionVectors, remove + re-add) by our own fixture writer.
    read_delta then applies the DV via `_metadata.row_index` — the
    aggregation is hash-equal to the predicate-equivalent oracle iff
    the bit format round-trips AND the row-position filter drops
    exactly the deleted rows. The codec spec vectors (ZeroMQ Z85
    "HelloWorld", RoaringFormatSpec run/array/bitmap containers) and
    every guard are pinned by tests/test_sources.py::
    TestDeletionVectors."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadv import commit_inline_dv
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_dv_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(
            orders.coalesce(1).sortWithinPartitions("o_orderkey"), t
        )
        [rel] = delta_live_files(t)
        positions = [
            r[0]
            for r in spark.read.parquet(f"{t}/{rel}")
            .select(F.col("_metadata.row_index"), "o_orderkey")
            .filter(F.col("o_orderkey") % 7 == 0)
            .collect()
        ]
        commit_inline_dv(t, rel, positions)
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_evolve_mapped",
    oracle="""
    SELECT m.cmode, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
             AS n_priced,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 1
                         THEN CAST(o_totalprice AS DECIMAL(18,6)) END)
                AS DOUBLE) AS sum_price
    FROM orders CROSS JOIN (VALUES ('name'), ('id')) m(cmode)
    GROUP BY m.cmode, o_orderpriority
    """,
)
def store_delta_evolve_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on COLUMN-MAPPED tables under the hash gate
    (VERDICT r11 item 5): the store_delta_evolve shape replayed on a
    NAME-mode and an ID-mode table — even-keyed orders land without a
    price column, odd-keyed orders append with one via
    ``merge_schema=True``. The evolved column gets a fresh
    ``col-<uuid>`` physicalName and a field id ABOVE the table's
    maxColumnId (metaData re-emits with the bumped id), and OLD files
    still resolve: in id mode the footer preflight admits a missing id
    above a file's own maximum (ids are monotone, so the file provably
    predates the column) and the reader null-fills it. Totals per
    (mode, priority) are hash-equal to the oracle iff BOTH modes
    evolved without touching, duplicating, or re-attributing a row.
    Unit pins: tests/test_sources.py::test_mapped_schema_evolution,
    tests/test_streaming.py (post-evolution stream null-fill)."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import read_delta, write_delta

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_evolve_cm_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = None
        for cmode in ("name", "id"):
            t = f"{work}/tbl_{cmode}"
            write_delta(
                orders.filter(F.col("o_orderkey") % 2 == 0).select(
                    "o_orderkey", "o_orderpriority"
                ),
                t,
                column_mapping=cmode,
            )
            write_delta(
                orders.filter(F.col("o_orderkey") % 2 == 1),
                t,
                merge_schema=True,
            )
            part = (
                read_delta(spark, t)
                .groupBy("o_orderpriority")
                .agg(
                    F.count("*").alias("n_orders"),
                    F.count("o_totalprice").alias("n_priced"),
                    dsum("o_totalprice", scale=6).alias("sum_price"),
                )
                .withColumn("cmode", F.lit(cmode))
            )
            out = part if out is None else out.unionByName(part)
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_dv_file",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE NOT (o_orderkey % 5 = 0)
    GROUP BY o_orderpriority
    """,
)
def store_delta_dv_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ON-DISK deletion vectors under the hash gate (PROTOCOL.md
    "Deletion Vector File Storage Format"; VERDICT r11 item 2): orders
    land PARTITIONED by o_orderpriority (one data file per priority,
    each sorted by o_orderkey), then the positions of rows with
    ``o_orderkey % 5 = 0`` in EVERY file are committed as storageType
    'u' descriptors referencing one shared multi-frame
    ``<prefix>/deletion_vector_<uuid>.bin`` — per-frame big-endian
    dataSize + MAGIC-roaring payload + CRC-32 behind a format-version
    byte, the exact layout delta-spark's DeletionVectorStore writes for
    one DELETE. read_delta derives each file path from the Z85-encoded
    UUID, verifies every framing field, and drops the positions via
    `_metadata.row_index`; the aggregation is hash-equal to the
    predicate-equivalent oracle iff path derivation, framing and the
    position filter are all exact. Guards (corrupt version/size/CRC,
    missing file) are pinned by
    tests/test_sources.py::TestDeletionVectors."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadv import commit_ondisk_dv
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_dvfile_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(
            orders.repartition(1, "o_orderpriority").sortWithinPartitions(
                "o_orderkey"
            ),
            t,
            partition_by=["o_orderpriority"],
        )
        rel_rows = {}
        for rel in delta_live_files(t):
            positions = [
                r[0]
                for r in spark.read.parquet(f"{t}/{rel}")
                .select(F.col("_metadata.row_index"), "o_orderkey")
                .filter(F.col("o_orderkey") % 5 == 0)
                .collect()
            ]
            if positions:
                rel_rows[rel] = positions
        commit_ondisk_dv(t, rel_rows)
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_v2ckpt",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM orders
    WHERE o_orderpriority IN ('3-MEDIUM', '5-LOW')
    GROUP BY o_orderpriority
    """,
)
def store_delta_v2ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2/UUID checkpoint replay under the hash gate (PROTOCOL.md "V2
    Spec Checkpoints"; VERDICT r10 item 6): orders land in a Delta table
    across two commits, a classic checkpoint is written and then
    CONVERTED to the v2 layout — a UUID-named sidecar-less JSON
    checkpoint carrying a checkpointMetadata marker — and the classic
    checkpoint plus every covered JSON commit is REMOVED (the
    log-retention end state a newer Databricks / delta-kernel writer
    leaves behind). read_delta must anchor the replay on the v2 file
    alone; the aggregation is hash-equal to the plain orders oracle iff
    the v2 replay reconstructs the exact live set. Parquet-with-sidecars
    and the corruption guards are pinned by
    tests/test_sources.py::TestDeltaV2Checkpoint."""
    import os as _os
    import shutil
    import tempfile
    import json as _json

    import pyarrow.parquet as pq

    from marketdb_spark.sources.deltalog import (
        delta_features,
        read_delta,
        write_checkpoint,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_v2ckpt_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(orders.filter(F.col("o_orderkey") % 2 == 0), t)
        write_delta(orders.filter(F.col("o_orderkey") % 2 == 1), t)
        v = write_checkpoint(t)
        log = _os.path.join(t, "_delta_log")
        rows = pq.read_table(
            _os.path.join(log, f"{v:020d}.checkpoint.parquet")
        ).to_pylist()

        def clean(x):
            if isinstance(x, list) and x and isinstance(x[0], tuple):
                return dict(x)
            if isinstance(x, list):
                return [clean(i) for i in x]
            if isinstance(x, dict):
                return {k: clean(i) for k, i in x.items() if i is not None}
            return x

        uuid_name = f"{v:020d}.checkpoint.4695e7a2-19d1-4a46-8b2b-6f3e0006cbf7.json"
        with open(_os.path.join(log, uuid_name), "w") as f:
            f.write(_json.dumps(
                {"checkpointMetadata": {"version": v}}
            ) + "\n")
            for r in rows:
                f.write(_json.dumps(
                    {k: clean(x) for k, x in r.items() if x is not None}
                ) + "\n")
        _os.remove(_os.path.join(log, f"{v:020d}.checkpoint.parquet"))
        _os.remove(_os.path.join(log, "_last_checkpoint"))
        for i in range(v + 1):
            p = _os.path.join(log, f"{i:020d}.json")
            if _os.path.exists(p):
                _os.remove(p)
        assert delta_features(t)["streamable"]
        back = read_delta(spark, t)
        out = (
            back.filter(
                F.col("o_orderpriority").isin("3-MEDIUM", "5-LOW")
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.min("o_orderkey").alias("min_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_cdf",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS commit_version, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'insert', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice + 1000 AS DECIMAL(18,6))) AS DOUBLE)
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def store_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed under the hash gate (PROTOCOL.md "Add CDC File";
    write_delta ``enable_cdf=True`` + deltalog.read_change_feed —
    delta-spark's ``readChangeFeed``): orders land in a
    priority-partitioned CDF-enabled Delta table (version 0), then a
    replaceWhere backfill rewrites the 1-URGENT partition with
    +1000-adjusted prices (version 1) — the commit stages its full
    row-level changes under ``_change_data/`` as ``cdc`` actions
    (asserted inline), and ``read_change_feed(0, 1)`` returns version
    0's inserts (derived from the add actions — pure appends record no
    cdc files per the protocol) plus version 1's delete/insert pairs
    (consumed from exactly the cdc files). The per-(version,
    change_type) row counts and exact price sums are hash-equal to the
    oracle iff the feed captures every row exactly once with the right
    change attribution — the CDC contract downstream incremental
    consumers (ETL, replication, audit) rely on. The protocol's
    derivation rules, vacuum interplay, and column-mapping composition
    are pinned by tests/test_sources.py::TestDeltaCDF."""
    import os as _os
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        read_change_feed,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    bad = "1-URGENT"
    work = tempfile.mkdtemp(prefix="store_cdf_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(
            orders, t, partition_by=["o_orderpriority"], enable_cdf=True
        )
        write_delta(
            orders.filter(F.col("o_orderpriority") == bad).withColumn(
                "o_totalprice", F.col("o_totalprice") + 1000
            ),
            t,
            mode="overwrite",
            replace_where={"o_orderpriority": [bad]},
        )
        # the backfill commit recorded its changes as cdc actions
        assert _os.path.isdir(_os.path.join(t, "_change_data"))
        out = (
            read_change_feed(spark, t, 0, 1)
            .groupBy(
                F.col("_commit_version").cast("long").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count("*").alias("n_rows"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_delete",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 10 < 5)
    GROUP BY o_orderpriority
    """,
)
def store_delta_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE under the hash gate (deltadml.delete_delta —
    delta-spark's ``DELETE FROM``, file-granular copy-on-write): orders
    land in a priority-partitioned Delta table, then DELETE removes the
    1-URGENT rows with ``o_orderkey % 10 < 5`` — a predicate that
    touches SOME rows of SOME files, so the operator must rewrite
    exactly the matched files without the matched rows (untouched
    partitions' file sets asserted identical inline — the property that
    makes row-level repair affordable at 100 TB), while time travel to
    the pre-delete version still reads every original row (asserted
    inline). The read-back aggregate is hash-equal to the oracle's
    NOT-predicate scan iff the deletion removed exactly the matching
    rows. CDF attribution, partition-moving updates, and merge clauses
    are pinned by tests/test_sources.py::TestDeltaDML."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadml import delete_delta
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_del_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(orders, t, partition_by=["o_orderpriority"])
        n0 = orders.count()
        untouched_before = [
            f
            for f in delta_live_files(t)
            if not f.startswith("o_orderpriority=1-URGENT")
        ]
        assert delete_delta(
            spark, t, "o_orderpriority = '1-URGENT' AND o_orderkey % 10 < 5"
        ) == 1
        # only the matched partition's files were rewritten
        assert [
            f
            for f in delta_live_files(t)
            if not f.startswith("o_orderpriority=1-URGENT")
        ] == untouched_before
        assert read_delta(spark, t, version=0).count() == n0
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_update",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(
             CASE WHEN o_orderpriority = '2-HIGH'
                  THEN o_totalprice + 100 ELSE o_totalprice END
             AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def store_delta_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE under the hash gate (deltadml.update_delta —
    delta-spark's ``UPDATE ... SET ... WHERE``): orders land
    priority-partitioned, then UPDATE adds 100 to every 2-HIGH price —
    the operator rewrites exactly the matched partition's files with the
    SET expression applied to matching rows and every other row byte-
    preserved (other partitions' file identity asserted inline). Hash-
    equal to the oracle's CASE-expression scan iff the update touched
    exactly the matching rows with exactly the SET arithmetic. The
    row-count per priority doubles as a no-row-loss check."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadml import update_delta
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_upd_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(orders, t, partition_by=["o_orderpriority"])
        untouched_before = [
            f
            for f in delta_live_files(t)
            if not f.startswith("o_orderpriority=2-HIGH")
        ]
        assert update_delta(
            spark,
            t,
            "o_orderpriority = '2-HIGH'",
            {"o_totalprice": "o_totalprice + 100"},
        ) == 1
        assert [
            f
            for f in delta_live_files(t)
            if not f.startswith("o_orderpriority=2-HIGH")
        ] == untouched_before
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.max("o_orderkey").alias("max_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_merge",
    oracle="""
    WITH merged AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      UNION ALL
      SELECT o_orderkey + 100000000, '3-MEDIUM', 1.0
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM merged
    GROUP BY o_orderpriority
    """,
)
def store_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO under the hash gate (deltadml.merge_delta —
    delta-spark's MERGE, protocol-native upsert): orders land with the
    3-MEDIUM partition's prices CORRUPTED (+500), then one merge keyed
    on o_orderkey repairs them (whole-row when_matched='update' from the
    correct source rows) AND inserts synthetic new orders (keys shifted
    by 1e8, not matched → insert) in the SAME atomic commit. The
    read-back aggregate is hash-equal to `orders ∪ inserts` iff the
    merge updated every corrupted row, inserted every new row, and
    touched nothing else — matched-file granularity, duplicate-source
    rejection, CDF pre/postimage attribution and the delete clause are
    pinned by tests/test_sources.py::TestDeltaDML."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadml import merge_delta
    from marketdb_spark.sources.deltalog import read_delta, write_delta

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    bad = "3-MEDIUM"
    work = tempfile.mkdtemp(prefix="store_merge_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        corrupted = orders.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderpriority") == bad,
                F.col("o_totalprice") + 500,
            ).otherwise(F.col("o_totalprice")),
        )
        write_delta(corrupted, t, partition_by=["o_orderpriority"])
        source = orders.filter(F.col("o_orderpriority") == bad).unionByName(
            orders.filter(F.col("o_orderkey") < 1000).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                F.lit(bad).alias("o_orderpriority"),
                F.lit(1.0).alias("o_totalprice"),
            )
        )
        assert merge_delta(spark, t, source, on=["o_orderkey"]) == 1
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.max("o_orderkey").alias("max_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_restore",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def store_delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE under the hash gate (deltadml.restore_delta —
    delta-spark's RESTORE ... TO VERSION AS OF): orders land as version
    0, then two damaging commits follow — a replaceWhere overwrite that
    corrupts one partition's prices and a DELETE that drops rows — and
    one RESTORE commit undoes both by re-referencing version 0's exact
    file set (ZERO data movement, file-set identity asserted inline;
    the damaged states stay time-travelable, asserted inline). The
    read-back aggregate is hash-equal to plain orders iff the restore
    reconstructed the snapshot exactly — the undo primitive that makes
    a bad 100 TB write a log-sized repair, not a re-load. CDF diff
    attribution and the vacuumed-target guard are pinned by
    tests/test_sources.py::TestDeltaDML::test_restore_to_version."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadml import delete_delta, restore_delta
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    bad = "5-LOW"
    work = tempfile.mkdtemp(prefix="store_restore_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(orders, t, partition_by=["o_orderpriority"])
        files_v0 = delta_live_files(t)
        # damage 1: corrupt one partition's prices
        write_delta(
            orders.filter(F.col("o_orderpriority") == bad).withColumn(
                "o_totalprice", F.col("o_totalprice") * 2
            ),
            t,
            mode="overwrite",
            replace_where={"o_orderpriority": [bad]},
        )
        # damage 2: drop a slice of rows
        assert delete_delta(spark, t, "o_orderkey % 7 = 0") == 2
        assert restore_delta(spark, t, 0) == 3
        assert delta_live_files(t) == files_v0  # exact snapshot, no copies
        # the damaged intermediate is still reachable; its count and the
        # raw-side count are independent read jobs — overlap them (§2.6)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            v2_f = pool.submit(read_delta(spark, t, version=2).count)
            raw_f = pool.submit(orders.count)
            assert v2_f.result() < raw_f.result()
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
                F.min("o_orderkey").alias("min_key"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_evolve",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
             AS n_priced,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 1
                         THEN CAST(o_totalprice AS DECIMAL(18,6)) END)
                AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def store_delta_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema EVOLUTION under the hash gate (write_delta
    ``merge_schema=True`` — delta-spark's mergeSchema append): even-keyed
    orders land first WITHOUT a price column (version 0), then odd-keyed
    orders append WITH one — the commit re-emits metaData with the union
    schema, and the read-back shows every pre-evolution row with a NULL
    price while post-evolution rows carry theirs (the parquet reader's
    missing-column fill, steered by the table schema). The per-priority
    row count, priced-row count, and exact priced sum are hash-equal to
    the oracle's CASE-split iff evolution widened the schema without
    touching, duplicating, or re-attributing a single row. Version 0
    still reads with its own two-column schema (asserted inline); type
    conflicts, the strict default, and configuration preservation are
    pinned by tests/test_sources.py (test_merge_schema_append_evolution)."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import read_delta, write_delta

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_evolve_")
    t = f"{work}/tbl"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        write_delta(
            orders.filter(F.col("o_orderkey") % 2 == 0).select(
                "o_orderkey", "o_orderpriority"
            ),
            t,
        )
        write_delta(
            orders.filter(F.col("o_orderkey") % 2 == 1),
            t,
            merge_schema=True,
        )
        assert read_delta(spark, t, version=0).columns == [
            "o_orderkey", "o_orderpriority",
        ]
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.count("o_totalprice").alias("n_priced"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_cdf_dv",
    oracle="""
    SELECT CAST(v AS BIGINT) AS commit_version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM (
        SELECT 1 AS v, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT 2 AS v, o_totalprice FROM orders
        WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
    ) changes
    GROUP BY v
    """,
)
def store_delta_cdf_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed derivation for FOREIGN deletion-vector DELETEs
    (PROTOCOL.md "Add CDC File" + "Deletion Vector Descriptor Schema";
    VERDICT r12 item 2): orders land in a CDF-enabled Delta table as one
    sorted file, then two foreign DV commits — the modern DML shape
    ``add(file, DV') + remove(file, DV)`` with NO cdc files — soft-delete
    the ``o_orderkey % 7 == 0`` rows (v1, INLINE vector) and grow the
    vector to also cover ``o_orderkey % 5 == 0`` (v2, ON-DISK vector).
    read_change_feed must replay each commit as ROW-LEVEL deletes of
    exactly positions(DV_new) − positions(DV_prev) — v1 the %7 rows, v2
    only the newly-vectored %5-and-not-%7 rows, never the whole file and
    never the union twice. Hash-equal to the predicate-split oracle iff
    the DV diff, the position semi-join and both storage codecs are all
    exact. Shrinking-vector and vacuumed-DV guards are pinned by
    tests/test_sources.py::TestDeletionVectors."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadv import (
        commit_inline_dv,
        commit_ondisk_dv,
    )
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_change_feed,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_cdfdv_")
    t = f"{work}/tbl"
    try:
        write_delta(
            orders.coalesce(1).sortWithinPartitions("o_orderkey"),
            t,
            enable_cdf=True,
        )
        [rel] = delta_live_files(t)
        pos = {
            r[0]: r[1]
            for r in spark.read.parquet(f"{t}/{rel}")
            .select(F.col("_metadata.row_index"), "o_orderkey")
            .collect()
        }
        first = sorted(i for i, k in pos.items() if k % 7 == 0)
        grown = sorted(
            i for i, k in pos.items() if k % 7 == 0 or k % 5 == 0
        )
        commit_inline_dv(t, rel, first)  # v1
        commit_ondisk_dv(t, {rel: grown})  # v2: strict superset
        out = (
            read_change_feed(spark, t, 1, 2)
            .filter(F.col("_change_type") == "delete")
            .groupBy(F.col("_commit_version").alias("commit_version"))
            .agg(
                F.count("*").alias("n_rows"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_dv_delete",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE NOT (o_orderkey % 3 = 0) AND NOT (o_orderkey % 7 = 0)
    GROUP BY o_orderpriority
    """,
)
def store_delta_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML-CREATED deletion vectors under the hash gate (VERDICT r13
    item 3; delta-spark's delete-with-DV behind
    ``delta.enableDeletionVectors=true``): orders land in a DV-enabled
    Delta table, then two delete_delta calls soft-delete the
    ``o_orderkey % 3 == 0`` and ``% 7 == 0`` rows — each commit stages
    ``add(file, DV')`` + a descriptor-carrying remove and ZERO rewritten
    data bytes (asserted inline: every add re-points at the original
    file with an on-disk 'u' vector; at 100 TB this is a metadata-sized
    commit instead of a terabyte rewrite). The aggregation is hash-equal
    to the predicate-equivalent oracle iff position collection, the
    union-growth on the second delete, the protocol framing and the
    read-side mask are all exact. Policy guards (threshold fallback,
    full-file plain remove, OPTIMIZE purge) are pinned by
    tests/test_sources.py::TestDVWriteCreation."""
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadml import delete_delta
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_dvdml_")
    t = f"{work}/tbl"
    try:
        write_delta(
            orders.coalesce(1).sortWithinPartitions("o_orderkey"),
            t,
            enable_dvs=True,
        )
        [rel] = delta_live_files(t)
        for cond, v in (("o_orderkey % 3 = 0", 1), ("o_orderkey % 7 = 0", 2)):
            got = delete_delta(spark, t, cond)
            if got != v:
                raise AssertionError(f"DELETE committed {got}, want {v}")
            with open(
                _os.path.join(t, "_delta_log", f"{v:020d}.json")
            ) as f:
                acts = [_json.loads(l) for l in f if l.strip()]
            adds = [a["add"] for a in acts if "add" in a]
            if not (
                len(adds) == 1
                and adds[0]["path"] == rel
                and adds[0].get("deletionVector", {}).get("storageType")
                == "u"
            ):
                raise AssertionError(
                    f"DELETE at v{v} did not emit a deletion vector: "
                    f"{adds}"
                )
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_rowid_dml",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(
               CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderkey % 4 <> 0
    GROUP BY o_orderpriority
    """,
)
def store_delta_rowid_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable row ids across DML (PROTOCOL.md "Row Tracking"; VERDICT
    r13 item 4): orders land in a ``delta.enableRowTracking=true`` table
    (fresh baseRowIds 0..n-1, materialized column names assigned at
    create), then a DELETE rewrites out the ``% 4`` rows and an UPDATE
    doubles the ``% 9`` rows' price — both carry the SURVIVING rows'
    materialized row ids/commit versions through the rewrite
    (deltadml._scan_with_row_ids). Inline Spark-side assertion: the
    post-DML row-id set is exactly n distinct ids (no loss, no dup, no
    reallocation drift); the aggregation is hash-equal to the
    predicate-equivalent oracle iff the rewrites also preserved the
    DATA exactly. Id-value pins live in
    tests/test_sources.py::TestRowTrackingPreservation."""
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadml import (
        _scan_with_row_ids,
        delete_delta,
        update_delta,
    )
    from marketdb_spark.sources.deltalog import (
        _materialized_rt_cols,
        _replay,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_rowid_")
    t = f"{work}/tbl"
    try:
        write_delta(
            orders.coalesce(1).sortWithinPartitions("o_orderkey"),
            t,
            enable_row_tracking=True,
        )
        delete_delta(spark, t, "o_orderkey % 4 = 0")
        update_delta(
            spark, t, "o_orderkey % 9 = 0",
            {"o_totalprice": "o_totalprice * 2"},
        )
        snap = _replay(t, None)
        rid_col, _ = _materialized_rt_cols(snap)
        ids = _scan_with_row_ids(
            spark, t, snap, snap.live, rid_col, "_rcv"
        ).select(rid_col)
        n_rows, n_ids = ids.count(), ids.distinct().count()
        if n_rows != n_ids:
            raise AssertionError(
                f"row ids not stable: {n_rows} rows, {n_ids} distinct ids"
            )
        out = (
            read_delta(spark, t)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_variant",
    oracle="""
    SELECT o_orderpriority AS pri,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderkey % 2 = 1
    GROUP BY o_orderpriority
    """,
)
def store_delta_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta ``variantType`` table feature end to end (PROTOCOL.md
    "Variant Data Type"; Delta 4.x / Spark 4 VARIANT): orders rows
    serialize to JSON, parse to a VARIANT column, land in a Delta table
    whose CREATE emits the feature-form protocol declaring variantType
    in both feature lists (asserted inline), and read back through the
    protocol replay — parquet stores the spec's (metadata, value)
    binary group, which Spark's vectorized reader reassembles.
    ``variant_get`` then extracts typed fields for the aggregation,
    hash-equal to the plain-columns oracle iff the JSON→variant→parquet
    →variant→typed-extract pipeline is lossless. Shredded variants and
    the streaming lanes refuse by name (TestDeltaVariant)."""
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import read_delta, write_delta

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 2 == 1
    )
    df = orders.select(
        "o_orderkey",
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("o_orderpriority").alias("pri"),
                    F.col("o_totalprice").alias("price"),
                )
            )
        ).alias("v"),
    )
    work = tempfile.mkdtemp(prefix="store_variant_")
    t = f"{work}/tbl"
    try:
        write_delta(df, t)
        with open(_os.path.join(t, "_delta_log", f"{0:020d}.json")) as f:
            acts = [_json.loads(l) for l in f if l.strip()]
        [proto] = [a["protocol"] for a in acts if "protocol" in a]
        if "variantType" not in (proto.get("readerFeatures") or []) or (
            "variantType" not in (proto.get("writerFeatures") or [])
        ):
            raise AssertionError(
                f"variant table did not declare variantType: {proto}"
            )
        out = (
            read_delta(spark, t)
            .select(
                F.variant_get("v", "$.pri", "string").alias("pri"),
                F.variant_get("v", "$.price", "double").alias("price"),
            )
            .groupBy("pri")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("price", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_dv_merge",
    oracle="""
    SELECT pri,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM (
        SELECT o_orderpriority AS pri,
               CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS price
        FROM orders
        UNION ALL
        SELECT o_orderpriority, o_totalprice FROM orders
        WHERE o_orderkey % 13 = 0
    ) rows_after_merge
    GROUP BY pri
    """,
)
def store_delta_dv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-emitting MERGE under the hash gate (VERDICT r13; delta-spark's
    merge-with-DV shape): orders land in a deletion-vector-enabled Delta
    table as one sorted file, then ONE MERGE updates the ``% 11`` rows
    (price doubled) and inserts a shifted copy of the ``% 13`` rows.
    The commit must re-add the original file with a vector covering
    exactly the matched positions and stage ONLY the updated + inserted
    rows (asserted inline: the DV add's cardinality equals the matched
    count, and no staged file re-materializes the untouched rows) — at
    100 TB this is why an upsert touching 0.1% of rows writes 0.1% of
    bytes. Hash-equal to the union-of-cases oracle iff the position
    vectoring, the modified-row staging and the read-side mask are all
    exact. Clause-policy guards live in
    tests/test_sources.py::TestDVMerge."""
    import json as _json
    import os as _os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from marketdb_spark.sources.deltadml import merge_delta
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_dvmerge_")
    t = f"{work}/tbl"
    try:
        write_delta(
            orders.coalesce(1).sortWithinPartitions("o_orderkey"),
            t,
            enable_dvs=True,
        )
        [rel] = delta_live_files(t)
        upd = orders.filter(F.col("o_orderkey") % 11 == 0).select(
            "o_orderkey",
            "o_orderpriority",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        )
        ins = orders.filter(F.col("o_orderkey") % 13 == 0).select(
            (F.col("o_orderkey") + F.lit(10_000_000_000)).alias(
                "o_orderkey"
            ),
            "o_orderpriority",
            "o_totalprice",
        )
        n_upd, n_ins = upd.count(), ins.count()
        v = merge_delta(spark, t, upd.unionByName(ins), ["o_orderkey"])
        with open(
            _os.path.join(t, "_delta_log", f"{v:020d}.json")
        ) as f:
            acts = [_json.loads(l) for l in f if l.strip()]
        adds = [a["add"] for a in acts if "add" in a]
        dv_adds = [a for a in adds if a.get("deletionVector")]
        if not (
            len(dv_adds) == 1
            and dv_adds[0]["path"] == rel
            and dv_adds[0]["deletionVector"]["cardinality"] == n_upd
        ):
            raise AssertionError(
                f"MERGE did not vector exactly the {n_upd} matched "
                f"positions: {dv_adds}"
            )
        staged_rows = sum(
            pq.read_metadata(_os.path.join(t, a["path"])).num_rows
            for a in adds
            if a["path"] != rel
        )
        if staged_rows != n_upd + n_ins:
            raise AssertionError(
                f"MERGE staged {staged_rows} rows, want updates+inserts "
                f"= {n_upd + n_ins}"
            )
        out = (
            read_delta(spark, t)
            .groupBy(F.col("o_orderpriority").alias("pri"))
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_dv_mapped",
    oracle="""
    SELECT m.mode, o.o_orderpriority AS pri,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CASE WHEN o.o_orderkey % 11 = 0
                              THEN o.o_totalprice * 2
                              ELSE o.o_totalprice END
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders o
    CROSS JOIN (SELECT 'name' AS mode UNION ALL SELECT 'id') m
    WHERE NOT (o.o_orderkey % 3 = 0)
    GROUP BY m.mode, o.o_orderpriority
    """,
)
def store_delta_dv_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-emitting DML on COLUMN-MAPPED tables (VERDICT r14 item 3; the
    modern Databricks/delta-rs default shape — columnMapping +
    deletionVectors together): for EACH mapping mode (name, id) orders
    land in a mapped, DV-enabled Delta table as one sorted file, a
    DELETE soft-deletes the ``% 3`` rows and a MERGE doubles the price
    of the surviving ``% 11`` rows — both commits must re-add the
    ORIGINAL physical file with a deletion vector (asserted inline:
    storageType 'u', path unchanged) while predicates and the merge
    source speak LOGICAL names throughout (the data files store
    ``col-<uuid>`` physical names; DV descriptors key physical paths —
    position bookkeeping is mapping-blind because parquet row indexes
    are). Hash-equal to the per-mode oracle iff the mapped scan, the
    executor-side bitmap aggregation and the read-side mask compose
    with the physical-name rename exactly. Guard behavior (the
    pre-round-14 copy-on-write fallback is GONE) is pinned by
    tests/test_sources.py::TestDVMapped."""
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from marketdb_spark.sources.deltadml import delete_delta, merge_delta
    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    work = tempfile.mkdtemp(prefix="store_dvmapped_")

    def leg(cmode: str) -> DataFrame:
        """One mode's full write→DELETE→MERGE→read cycle. The two legs
        touch disjoint table dirs and share no driver state, so they run
        as concurrent driver threads (spark_optimization_guide §2.6:
        each leg is ~25 tiny metadata-bound jobs whose per-job driver
        latency, not data, is the cost — overlapping the chains hides
        it; Spark schedules concurrent jobs FIFO and back-fills idle
        cores)."""
        t = f"{work}/tbl_{cmode}"
        write_delta(
            orders.coalesce(1).sortWithinPartitions("o_orderkey"),
            t,
            column_mapping=cmode,
            enable_dvs=True,
        )
        [rel] = delta_live_files(t)
        v1 = delete_delta(spark, t, "o_orderkey % 3 = 0")
        upd = orders.filter(F.col("o_orderkey") % 11 == 0).select(
            "o_orderkey",
            "o_orderpriority",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
        )
        v2 = merge_delta(
            spark, t, upd, ["o_orderkey"],
            when_matched="update", when_not_matched=None,
        )
        for v in (v1, v2):
            with open(
                _os.path.join(t, "_delta_log", f"{v:020d}.json")
            ) as f:
                acts = [_json.loads(l) for l in f if l.strip()]
            dv_adds = [
                a["add"]
                for a in acts
                if "add" in a and a["add"].get("deletionVector")
            ]
            if not (
                len(dv_adds) == 1
                and dv_adds[0]["path"] == rel
                and dv_adds[0]["deletionVector"]["storageType"] == "u"
            ):
                raise AssertionError(
                    f"{cmode}-mode DML at v{v} did not re-add {rel} "
                    f"with an on-disk vector: {dv_adds}"
                )
        return (
            read_delta(spark, t)
            .groupBy(F.col("o_orderpriority").alias("pri"))
            .agg(
                F.count("*").alias("n_orders"),
                dsum("o_totalprice", scale=6).alias("sum_price"),
            )
            .select(F.lit(cmode).alias("mode"), "pri", "n_orders", "sum_price")
        )

    try:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            outs = list(pool.map(leg, ("name", "id")))
        return outs[0].unionByName(outs[1]).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "store_delta_variant_shredded",
    oracle="""
    SELECT o_orderpriority AS pri,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderkey % 2 = 0
    GROUP BY o_orderpriority
    """,
)
def store_delta_variant_shredded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHREDDED variants (Delta ``variantShredding-preview``, PROTOCOL.md
    "Variant Shredding" / the parquet variant-shredding spec; VERDICT
    r14 item 4): orders rows parse into a VARIANT column and land in a
    Delta table with Spark 4's shredded variant WRITER enabled
    (``spark.sql.variant.writeShredding.enabled`` — the delta-spark 4.x
    writer shape), so the staged parquet stores the spec's
    metadata/value/``typed_value`` group with typed subcolumns instead
    of one opaque binary pair (asserted inline from the file footer).
    The CREATE declares ``variantShredding-preview`` next to
    variantType in both feature lists (asserted inline), and the read
    path replays the protocol and REASSEMBLES the shredded groups into
    variant values natively (Spark's vectorized reader;
    ``allowReadingShredded`` is on by default) — hash-equal to the
    plain-columns oracle iff shredded write → protocol → reassembly →
    ``variant_get`` typed extraction is lossless. The unshredded lane
    (store_delta_variant) stays green beside this; foreign-written
    shredded tables read through the same gate
    (tests/test_sources.py::TestDeltaVariant)."""
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from marketdb_spark.sources.deltalog import (
        delta_live_files,
        read_delta,
        write_delta,
    )

    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 2 == 0
    )
    df = orders.select(
        "o_orderkey",
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("o_orderpriority").alias("pri"),
                    F.col("o_totalprice").alias("price"),
                )
            )
        ).alias("v"),
    )
    work = tempfile.mkdtemp(prefix="store_variant_shred_")
    t = f"{work}/tbl"
    shred_confs = {
        "spark.sql.variant.writeShredding.enabled": "true",
        "spark.sql.variant.inferShreddingSchema": "true",
    }
    saved = {}
    try:
        for k, val in shred_confs.items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            spark.conf.set(k, val)
        try:
            write_delta(df, t)
        finally:
            for k, val in saved.items():
                if val is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, val)
        with open(_os.path.join(t, "_delta_log", f"{0:020d}.json")) as f:
            acts = [_json.loads(l) for l in f if l.strip()]
        [proto] = [a["protocol"] for a in acts if "protocol" in a]
        for feat in ("variantType", "variantShredding-preview"):
            if feat not in (proto.get("readerFeatures") or []) or (
                feat not in (proto.get("writerFeatures") or [])
            ):
                raise AssertionError(
                    f"shredded variant table did not declare {feat}: "
                    f"{proto}"
                )
        shredded = 0
        for rel in delta_live_files(t):
            with open(_os.path.join(t, rel), "rb") as fh:
                fh.seek(max(0, _os.path.getsize(_os.path.join(t, rel)) - 65536))
                if b"typed_value" in fh.read():
                    shredded += 1
        if not shredded:
            raise AssertionError(
                "no staged file carries a shredded (typed_value) "
                "variant group — the writer conf did not take"
            )
        out = (
            read_delta(spark, t)
            .select(
                F.variant_get("v", "$.pri", "string").alias("pri"),
                F.variant_get("v", "$.price", "double").alias("price"),
            )
            .groupBy("pri")
            .agg(
                F.count("*").alias("n_orders"),
                dsum("price", scale=6).alias("sum_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
