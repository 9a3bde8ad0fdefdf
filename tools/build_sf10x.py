"""Build the COMBINED key-shifted 10x dataset for the full-registry
correctness sweep (r9 VERDICT item 1).

The three timing-only scale builders (scale_step_experiment.py for the
TPC-H graph tables, its --docs variant for documents,
scale_step_events_vec.py for events/embeddings) each scale ONE family;
this builder applies all of their shifts to ONE directory so every
registry query sees genuinely 10x distinct data:

- customer/supplier/orders/lineitem/part: per-copy disjoint key
  offsets, referentially consistent (o_custkey shifts with c_custkey,
  lineitem with orders/part/supplier);
- documents: doc_id offset + per-copy bijective vocabulary suffix
  (within-copy shingle/Jaccard structure preserved exactly, distinct
  docs/shingles/band buckets really grow 10x);
- events: event_id/user_id offsets, timestamps untouched (10x users =
  10x daily traffic, the realistic growth axis);
- embeddings: vec_id offset + a distinct cyclic rotation per copy
  (norm- and within-copy-similarity-preserving, so the 10x corpus is
  not 10 identical point clouds and no cross-copy exact ties appear);
- region/nation: fixed dimensions, copied as-is (10x customers across
  the same 25 nations — the realistic scale-up).

Everything is written by DuckDB as ONE parquet file per table with
explicit casts back to the source's physical column types, so
(a) the driver-replica gate `tools/check_correctness.py <dir>` runs
against it unchanged, and (b) no engine's timestamp/timezone rewrite
semantics can perturb the values — both engines read byte-identical
inputs, which is the whole premise of the compare.

    python tools/build_sf10x.py            # build (idempotent)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# _v2: '§'-separated vocab suffix (r10 ADVICE) — new default dir so a
# stale pre-fix build's marker doesn't mask the changed content
DST = os.environ.get("SPARK_GRAFT_10X_DIR", "/tmp/erkg_sf10x_all_v2")
COPIES = 10

# disjoint key spaces per copy; far above any sf0.1 key
# (mirrors scale_step_experiment.OFF + the events/embeddings tools)
OFF = {
    "c_custkey": 10_000_000,
    "s_suppkey": 10_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "l_orderkey": 100_000_000,
    "l_suppkey": 10_000_000,
    "l_partkey": 10_000_000,
    "p_partkey": 10_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 1_000_000,
}

KEY_SHIFT_TABLES = ("customer", "supplier", "orders", "lineitem", "part", "events")
LINKED_TABLES = ("region", "nation")


def _copy_select(con, table: str, c: int) -> str:
    """SELECT list for copy ``c`` of ``table`` preserving each source
    column's DuckDB type exactly (key shifts cast back to the source
    type; unshifted columns pass through untouched)."""
    cols = con.sql(f"DESCRIBE SELECT * FROM src_{table}").fetchall()
    parts = []
    for name, typ, *_ in cols:
        if table in KEY_SHIFT_TABLES and name in OFF:
            parts.append(f'CAST("{name}" + {c * OFF[name]} AS {typ}) AS "{name}"')
        elif table == "documents" and name == "doc_id":
            parts.append(f'CAST(doc_id + {c * OFF["doc_id"]} AS {typ}) AS doc_id')
        elif table == "documents" and name == "text" and c > 0:
            # bijective per-copy vocab map: suffix every
            # whitespace-token with '§<copy>' (same device as
            # scale_step_experiment.build_docs). The separator is a
            # character that cannot appear in the synthetic corpus, so
            # copy i's 'tok§i' can never collide with another copy's
            # vocabulary even when source words end in digits
            # (r10 ADVICE: bare '1' suffix maps copy-1 'tok' onto
            # copy-0's original 'tok1'); disjointness is also asserted
            # on the actual build output in build().
            parts.append(
                "array_to_string(list_transform(string_split(text, ' '),"
                f" w -> w || '§{c}'), ' ') AS text"
            )
        elif table == "embeddings" and name == "vec_id":
            parts.append(f'CAST(vec_id + {c * OFF["vec_id"]} AS {typ}) AS vec_id')
        elif table == "embeddings" and name == "embedding" and c > 0:
            # cyclic rotations are distinct for c in 1..63 (gcd(7,64)=1);
            # beyond that (the 100x build) copies 64+ NEGATE the rotated
            # vector — norm- and within-copy-cosine-preserving like the
            # rotation itself, and cross-copy cosine vs the same-rotation
            # copy is exactly -1, so no positive-threshold near-dup or
            # exact tie can appear between any two copies
            rot = (c * 7) % 64
            expr = f"embedding[{rot + 1}:] || embedding[1:{rot}]"
            if c >= 64:
                expr = f"list_transform({expr}, x -> -x)"
            parts.append(f"CAST({expr} AS FLOAT[]) AS embedding")
        else:
            parts.append(f'"{name}"')
    return "SELECT " + ", ".join(parts) + f" FROM src_{table}"


def build(src: str = SRC, dst: str = DST, copies: int = COPIES) -> str:
    marker = os.path.join(dst, "_SCALED_OK")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        sp = os.path.join(src, fname)
        dp = os.path.join(dst, fname)
        if table in LINKED_TABLES:
            try:
                os.link(sp, dp)
            except OSError:
                shutil.copy(sp, dp)
            continue
        con.sql(f"CREATE OR REPLACE VIEW src_{table} AS SELECT * FROM '{sp}'")
        union = "\nUNION ALL\n".join(
            _copy_select(con, table, c) for c in range(copies)
        )
        con.sql(f"COPY ({union}) TO '{dp}' (FORMAT PARQUET)")
    _assert_vocab_disjoint(con, src, dst, copies)
    open(marker, "w").close()
    return dst


def _assert_vocab_disjoint(con, src: str, dst: str, copies: int) -> None:
    """The '10x distinct shingles' premise requires the per-copy vocab
    maps to be collision-free ON THE ACTUAL DATA, not just by
    construction (r10 ADVICE). Verified on the build output itself:
    distinct words must grow exactly ``copies``-fold."""
    sp, dp = os.path.join(src, "documents.parquet"), os.path.join(
        dst, "documents.parquet"
    )
    if not (os.path.exists(sp) and os.path.exists(dp)):
        return
    base_v, big_v = (
        con.sql(
            f"""SELECT COUNT(DISTINCT w) FROM (
                  SELECT unnest(string_split(text, ' ')) AS w
                  FROM '{p}')"""
        ).fetchone()[0]
        for p in (sp, dp)
    )
    assert big_v == copies * base_v, (
        f"per-copy vocab collision: {big_v} distinct words, "
        f"expected {copies} * {base_v}"
    )


def main() -> None:
    out = build()
    con = duckdb.connect()
    for fname in sorted(os.listdir(out)):
        if fname.endswith(".parquet"):
            n = con.sql(f"SELECT COUNT(*) FROM '{out}/{fname}'").fetchone()[0]
            print(f"{fname}: {n}")
    print(out)


if __name__ == "__main__":
    main()
