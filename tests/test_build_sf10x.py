"""The combined scaled-dataset builder (tools/build_sf10x.py) is the
premise of CORRECTNESS_10X.md: both engines must read byte-identical
files whose physical schemas match the source exactly, with
referential integrity held across the key shifts. Pinned here on a
hermetic 2-copy build from sf0.001 so a builder regression can't
silently turn the 10x sweep into a test of the wrong dataset."""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
COPIES = 2


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from tools.build_sf10x import build

    dst = str(tmp_path_factory.mktemp("sf2x"))
    return build(src=SRC, dst=dst + "/d", copies=COPIES)


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_schemas_and_counts(built):
    con = duckdb.connect()
    for t in TABLES:
        a = pq.read_schema(f"{SRC}/{t}.parquet")
        b = pq.read_schema(f"{built}/{t}.parquet")
        for f in a:
            assert b.field(f.name).type == f.type, (t, f.name)
        n_src = con.sql(f"SELECT COUNT(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n_dst = con.sql(f"SELECT COUNT(*) FROM '{built}/{t}.parquet'").fetchone()[0]
        mult = 1 if t in ("region", "nation") else COPIES
        assert n_dst == mult * n_src, t


def test_referential_integrity_held(built):
    con = duckdb.connect()
    orphans = con.sql(
        f"""
        SELECT
          (SELECT COUNT(*) FROM '{built}/orders.parquet' o
           LEFT JOIN '{built}/customer.parquet' c ON o.o_custkey = c.c_custkey
           WHERE c.c_custkey IS NULL),
          (SELECT COUNT(*) FROM '{built}/lineitem.parquet' l
           LEFT JOIN '{built}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey IS NULL),
          (SELECT COUNT(*) FROM '{built}/lineitem.parquet' l
           LEFT JOIN '{built}/part.parquet' p ON l.l_partkey = p.p_partkey
           WHERE p.p_partkey IS NULL)
        """
    ).fetchone()
    assert orphans == (0, 0, 0)


def test_copies_are_disjoint_and_structure_preserving(built):
    con = duckdb.connect()
    # distinct doc vocab really grows: copy-1 words are suffixed
    base_v, big_v = (
        con.sql(
            f"""SELECT COUNT(DISTINCT word) FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS word
                FROM '{d}/documents.parquet')"""
        ).fetchone()[0]
        for d in (SRC, built)
    )
    assert big_v == COPIES * base_v
    # embeddings: rotation preserves the norm, ids are disjoint
    bad = con.sql(
        f"""SELECT COUNT(*) FROM (
              SELECT vec_id FROM '{built}/embeddings.parquet'
              GROUP BY vec_id HAVING COUNT(*) > 1)"""
    ).fetchone()[0]
    assert bad == 0
    norms = con.sql(
        f"""SELECT ROUND(SUM(sqrt(list_dot_product(
                CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 3)
            FROM '{built}/embeddings.parquet'"""
    ).fetchone()[0]
    base_norm = con.sql(
        f"""SELECT ROUND(SUM(sqrt(list_dot_product(
                CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 3)
            FROM '{SRC}/embeddings.parquet'"""
    ).fetchone()[0]
    assert abs(norms - COPIES * base_norm) < 0.01
