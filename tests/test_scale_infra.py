"""Scale-infrastructure tests: salting and bucketing do what
SCALING.md claims — same results, fewer/better-spread shuffles."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from erkg_tutorials_spark.functions.skew import salted_count, salted_join
from erkg_tutorials_spark.sources.bucketed import read_table, write_bucketed


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestSaltedJoin:
    def _skewed(self, spark):
        # 10k rows of key 'hot', 100 of everything else
        return spark.range(10_100).select(
            F.when(F.col("id") < 10_000, "hot")
            .otherwise(F.concat(F.lit("k"), F.col("id") % 100))
            .alias("k"),
            F.col("id").alias("payload"),
        )

    def test_same_result_as_plain_join(self, spark):
        big = self._skewed(spark)
        small = spark.createDataFrame(
            [("hot", 1), ("k5", 2), ("missing", 3)], ["k", "v"]
        )
        plain = big.join(small, "k").groupBy("k", "v").count()
        salted = salted_join(big, small, "k", salt=4).groupBy("k", "v").count()
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_left_join_keeps_unmatched(self, spark):
        big = self._skewed(spark)
        small = spark.createDataFrame([("hot", 1)], ["k", "v"])
        out = salted_join(big, small, "k", salt=4, how="left")
        assert out.count() == big.count()
        assert out.where(F.col("v").isNull()).count() == 100

    def test_hot_key_spreads_over_salts(self, spark):
        from erkg_tutorials_spark.functions.skew import SALT_COL, _scatter

        salts = (
            _scatter(self._skewed(spark).where(F.col("k") == "hot"), 8)
            .select(SALT_COL)
            .distinct()
            .count()
        )
        assert salts == 8  # every salt partition carries part of the hot key

    def test_salted_count_matches(self, spark):
        big = self._skewed(spark)
        plain = {r["k"]: r["count"] for r in big.groupBy("k").count().collect()}
        salted = {r["k"]: r["count"] for r in salted_count(big, "k", salt=4).collect()}
        assert plain == salted


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark):
        left = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        write_bucketed(left, "t_left", ["k"], n_buckets=4, sort_cols=["k"])
        write_bucketed(right, "t_right", ["k"], n_buckets=4, sort_cols=["k"])
        # tiny test tables would broadcast (bucketing bypassed); force
        # the shuffle-join path the bucketing exists to optimize
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_table(spark, "t_left").join(
                read_table(spark, "t_right"), "k"
            )
            plan = plan_of(joined)
            # co-located: both sides read pre-bucketed, no shuffle exchange
            assert "Exchange hashpartitioning" not in plan, plan
            assert "Bucketed: true" in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_bucketed_agg_has_no_exchange(self, spark):
        df = spark.range(1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
        write_bucketed(df, "t_agg", ["k"], n_buckets=4)
        agg = read_table(spark, "t_agg").groupBy("k").agg(F.sum("v").alias("s"))
        plan = plan_of(agg)
        assert "Exchange hashpartitioning" not in plan, plan
        assert agg.count() == 50


class TestPartitionedSink:
    def test_partition_pruning_on_read(self, spark, tmp_path):
        from erkg_tutorials_spark.sources.tabular import write_partitioned

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = str(tmp_path / "docs_by_lang")
        write_partitioned(docs, out, ["lang"])

        back = spark.read.parquet(out)
        en = back.where(F.col("lang") == "en")
        plan = plan_of(en)
        # the lang predicate must prune at the partition level, not
        # reach the scan as a data filter
        assert "PartitionFilters" in plan and "lang" in plan.split(
            "PartitionFilters"
        )[1].split("\n")[0], plan
        assert en.count() == docs.where(F.col("lang") == "en").count()

    def test_round_trip_preserves_rows(self, spark, tmp_path):
        from erkg_tutorials_spark.sources.tabular import write_partitioned

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = str(tmp_path / "docs_rt")
        write_partitioned(docs, out, ["lang", "source"])
        back = spark.read.parquet(out)
        assert back.count() == docs.count()
        assert set(back.columns) == set(docs.columns)
