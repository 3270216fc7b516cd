"""Cross-engine correctness: every queries() entry vs its DuckDB
oracle at sf0.001, compared as order-insensitive row multisets
(stricter than the driver's value-hash)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
        return round(float(v), 6)
    return v


def _multiset(rows):
    out = {}
    for r in rows:
        k = tuple(_norm(v) for v in r)
        out[k] = out.get(k, 0) + 1
    return out


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, sf_dir, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)

    if sql is None:
        # pipeline-native ops (coref/canonicalize/model inference) have
        # no ANSI-SQL oracle; gate = non-empty + deterministic repeat
        rows1 = _multiset(tuple(r) for r in q(spark, sf_dir).collect())
        rows2 = _multiset(tuple(r) for r in q(spark, sf_dir).collect())
        assert rows1 and rows1 == rows2, f"{name}: nondeterministic or empty"
        return

    sdf = q(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()

    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    # driver compares after sorting columns by name; row-level multiset
    # equality implies that
    s_idx = sorted(range(len(scols)), key=lambda i: scols[i])
    sm = _multiset([tuple(r[i] for i in s_idx) for r in srows])
    dm = _multiset([tuple(r[i] for i in s_idx) for r in drows])
    only_s = {k: v for k, v in sm.items() if dm.get(k) != v}
    only_d = {k: v for k, v in dm.items() if sm.get(k) != v}
    assert sm == dm, (
        f"{name}: {len(srows)} spark vs {len(drows)} duck rows; "
        f"spark-only sample {list(only_s.items())[:3]}; "
        f"duck-only sample {list(only_d.items())[:3]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(10).collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "doc_id", "subj", "pred", "obj", "event_subtype", "realis", "confidence"
    }
