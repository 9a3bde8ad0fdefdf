"""The SQL API tier: every table registers as a temp view and the
engine's query shapes run as plain ``spark.sql`` strings with results
identical to the DataFrame tier (SURVEY.md §7 "DataFrame/SQL for
everything relational")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erkg_tutorials_spark.catalog import TABLES, register_views
from erkg_tutorials_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF_DIR)
    return spark


class TestSqlTier:
    def test_all_tables_registered(self, views):
        for t in TABLES:
            assert views.sql(f"SELECT * FROM {t} LIMIT 1").count() <= 1

    def test_sql_equals_dataframe_aggregation(self, views):
        sql = views.sql(
            """
            SELECT c_mktsegment, COUNT(*) AS n
            FROM customer GROUP BY c_mktsegment
            """
        )
        df = (
            views.table("customer")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))

    def test_sql_window_equals_registry_query(self, views):
        """The W2 windowed-ratio shape via spark.sql matches the
        registered DataFrame implementation."""
        sql = views.sql(
            """
            WITH n AS (
              SELECT n_regionkey, n_name, COUNT(*) AS n_cust
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_regionkey, n_name
            )
            SELECT n_name, n_cust,
                   ROUND(n_cust / SUM(n_cust) OVER (PARTITION BY n_regionkey), 6) AS share
            FROM n
            """
        )
        df = QUERIES["w2_nation_share"](views, SF_DIR)
        assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))

    def test_sql_two_hop_matches_dataframe_khop(self, views):
        """The reference's 2-hop reach spelled as recursive-free SQL
        equals the k_hop operator output."""
        sql = views.sql(
            """
            WITH seeds AS (
              SELECT 'c:' || c_custkey AS id FROM customer WHERE c_custkey % 37 = 0
            ),
            raw AS (
              SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            ),
            edges AS (
              SELECT c AS src, s AS dst FROM raw
              UNION ALL SELECT s, c FROM raw
            ),
            hop1 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN seeds ON e.src = seeds.id),
            r01 AS (SELECT id FROM seeds UNION SELECT id FROM hop1),
            hop2 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN r01 ON e.src = r01.id)
            SELECT id FROM seeds UNION SELECT id FROM hop1 UNION SELECT id FROM hop2
            """
        )
        df = QUERIES["g3_two_hop_reach"](views, SF_DIR).select("id")
        assert {r["id"] for r in sql.collect()} == {r["id"] for r in df.collect()}
