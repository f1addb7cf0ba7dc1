"""Source/sink round-trips: csv, json, partitioned + bucketed parquet."""

import pyspark.sql.functions as F

from mallard_spark.sources.readers import load_table
from mallard_spark.sources.writers import (
    write_bucketed,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_partitioned,
)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "supplier")
    write_orc(src, str(tmp_path / "supp_orc"))
    back = spark.read.orc(str(tmp_path / "supp_orc"))
    filtered = back.filter(F.col("s_acctbal") > 0).select("s_suppkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan  # ORC scan gets pushdown too
    assert filtered.count() == src.filter(F.col("s_acctbal") > 0).count()


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    write_csv(src, str(tmp_path / "region_csv"))
    back = spark.read.option("header", "true").schema(src.schema).csv(
        str(tmp_path / "region_csv")
    )
    assert sorted(r.r_name for r in back.collect()) == sorted(
        r.r_name for r in src.collect()
    )


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    write_json(src, str(tmp_path / "nation_json"))
    back = spark.read.schema(src.schema).json(str(tmp_path / "nation_json"))
    assert back.count() == src.count()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_partitioned(src, str(tmp_path / "orders_part"), ["o_year"])
    back = spark.read.parquet(str(tmp_path / "orders_part"))
    pruned = back.filter(F.col("o_year") == 1996)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the filter must land in PartitionFilters
    assert "PartitionFilters: [" in plan
    assert pruned.count() == src.filter(F.col("o_year") == 1996).count()


def test_bucketed_write_enables_shuffle_free_agg(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf — use the session default (the
    # table is dropped in the finally)
    src = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(src, "li_bucketed_test", "l_orderkey", n_buckets=4)
    try:
        t = spark.table("li_bucketed_test")
        agg = t.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # bucketing on the grouping key removes the exchange entirely
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() == src.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed_test")


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Two tables bucketed on the same join key: the join plan has no
    exchange at all — the write-time layout replaces the shuffle.
    This is the 100 TB answer for the recurring lineitem⋈orders join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "li_bkt_join", "l_orderkey", n_buckets=4, sort_col="l_orderkey")
    write_bucketed(orders, "ord_bkt_join", "o_orderkey", n_buckets=4, sort_col="o_orderkey")
    try:
        j = spark.table("li_bkt_join").join(
            spark.table("ord_bkt_join"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert j.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt_join")
        spark.sql("DROP TABLE IF EXISTS ord_bkt_join")


def test_parquet_write_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "part")
    write_parquet(src, str(tmp_path / "part_pq"))
    assert spark.read.parquet(str(tmp_path / "part_pq")).count() == src.count()


def test_compact_parquet_reduces_file_count(spark, sf_dir, tmp_path):
    """Fragment a table into many tiny files, compact, and prove the
    data survives while the file count collapses to the size target."""
    import os

    from mallard_spark.sources.writers import compact_parquet

    src = load_table(spark, sf_dir, "orders")
    frag = str(tmp_path / "frag")
    src.repartition(64).write.parquet(frag)  # the small-files mess
    n_in = sum(f.endswith(".parquet") for f in os.listdir(frag))
    assert n_in >= 64

    compacted = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, frag, compacted, target_file_bytes=4 << 20)
    files = [f for f in os.listdir(compacted) if f.endswith(".parquet")]
    assert len(files) == n_out < n_in
    back = spark.read.parquet(compacted)
    assert back.count() == src.count()
    assert {f.name for f in back.schema} == {f.name for f in src.schema}


def test_write_training_shards_layout(spark, sf_dir, tmp_path):
    """One sorted file per shard directory; every doc lands exactly
    once; within-file order is the shard_assignment pos order."""
    import os

    from mallard_spark.registry import load_all
    from mallard_spark.sources.writers import write_training_shards

    docs = load_table(spark, sf_dir, "documents")
    shards = load_all()["shard_assignment"].fn(spark, sf_dir)
    out = str(tmp_path / "shards")
    write_training_shards(docs, shards, out)

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(shard_dirs) == 8
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, d  # one sequential file per shard

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # within-shard file order == pos order (read preserves row order per file)
    one = back.filter(F.col("shard_id") == shard_dirs[0].split("=")[1]).toPandas()
    assert list(one["pos"]) == sorted(one["pos"])


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on read: day-2 files add a column; mergeSchema
    unions the schemas and backfills NULL for day-1 rows — the
    append-only table-evolution pattern a long-lived 100 TB dataset
    relies on (new columns must never require rewriting old files)."""
    import os

    base = str(tmp_path / "evo")
    spark.range(5).selectExpr("id", "id * 2 AS v").write.parquet(
        os.path.join(base, "day=1")
    )
    spark.range(5, 8).selectExpr(
        "id", "id * 2 AS v", "'tag' || id AS label"
    ).write.parquet(os.path.join(base, "day=2"))

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "v", "label", "day"}
    assert df.count() == 8
    assert df.filter("day = 1 AND label IS NULL").count() == 5
    assert df.filter("day = 2 AND label IS NOT NULL").count() == 3


def test_write_zorder_shrinks_footer_ranges(spark, tmp_path):
    """The Z-order sink must ACTUALLY shrink per-file min-max ranges
    in the parquet footers (what scan-time skipping reads) on both
    clustered columns, vs a single-column-sorted write."""
    import pyarrow.parquet as pq

    from mallard_spark.sources.readers import load_table
    from mallard_spark.sources.writers import write_zorder

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_partkey", "l_orderkey"
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted")
    write_zorder(li, zpath, "l_partkey", "l_orderkey", n_files=16)
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def spans(path, col):
        import glob
        import os

        total, n = 0, 0
        lo = hi = None
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            fmin = fmax = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is None:
                continue
            total += fmax - fmin
            n += 1
            lo = fmin if lo is None else min(lo, fmin)
            hi = fmax if hi is None else max(hi, fmax)
        return (total / n) / max(1, hi - lo)  # avg span fraction

    # single-column sort: near-zero span on the sort column, ~full on
    # the other; zorder: materially below full range on BOTH
    z_x, z_y = spans(zpath, "l_partkey"), spans(zpath, "l_orderkey")
    s_x = spans(spath, "l_partkey")
    assert s_x > 0.9  # the "no skipping" baseline this sink fixes
    # thresholds leave slack for repartitionByRange's SAMPLED
    # boundaries (the sampling seed varies with session history, so a
    # boundary file occasionally straddles a wider range)
    assert z_x < 0.75 and z_y < 0.75, (z_x, z_y)


def test_write_zorder_date_and_double_columns(spark, sf_dir, tmp_path):
    """The quantizer must handle the non-integer dimension types a
    real ZORDER call uses (dates, doubles) — review finding r4."""
    from mallard_spark.sources.readers import load_table
    from mallard_spark.sources.writers import write_zorder

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_orderkey"
    )
    path = str(tmp_path / "zmix")
    write_zorder(li, path, "l_extendedprice", "l_shipdate", n_files=4)
    out = spark.read.parquet(path)
    assert out.count() == li.count()
    assert set(out.columns) == set(li.columns)


def test_materialize_dir_override_is_honored(spark, tmp_path):
    # The barrier path must be steerable to shared storage (VERDICT
    # r4: driver-local /tmp cannot work on a real cluster). Conf
    # takes precedence over env var, env var over the local default.
    import os

    from mallard_spark.functions import exec as X

    df = spark.range(10).withColumnRenamed("id", "k")
    try:
        spark.conf.set(X.MATERIALIZE_DIR_CONF, str(tmp_path / "conf_dir"))
        out = X.materialize(df, "override_probe")
        assert (tmp_path / "conf_dir" / "override_probe").exists()
        assert out.count() == 10
        spark.conf.unset(X.MATERIALIZE_DIR_CONF)
        os.environ[X.MATERIALIZE_DIR_ENV] = str(tmp_path / "env_dir")
        X.materialize(df, "override_probe")
        assert (tmp_path / "env_dir" / "override_probe").exists()
    finally:
        os.environ.pop(X.MATERIALIZE_DIR_ENV, None)
        try:
            spark.conf.unset(X.MATERIALIZE_DIR_CONF)
        except Exception:
            pass
