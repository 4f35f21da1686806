"""Fixture-drift guard: the engine's readers encode assumptions about the
PHYSICAL parquet types of the driver-generated fixtures (most notably
events.ts, which has shipped both as TIMESTAMP(NANOS) and
TIMESTAMP(MICROS) and silently broke the whole streaming family once —
VERDICT r3). If the driver regenerates a fixture with different physical
types, this test fails in ONE obvious place instead of as a pile of
unrelated stack traces.

The readers that consume these contracts:
- sources/tables.py:_load_events (nanos-bigint vs NTZ branch)
- streaming/ops.py:events_stream (same branch, streaming side)
- llm/similarity.py (embedding is list<float>)
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

# table -> {column: physical arrow type string}. events.ts may be either
# of the two types the fixture has actually shipped with; both are
# handled by the readers and exercised in their tests.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": ("timestamp[us]", "timestamp[ns]", "int64"),
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_physical_schema(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    got = {f.name: str(f.type) for f in schema}
    want = EXPECTED[table]
    assert set(got) == set(want), (
        f"{table}: column set drifted; got {sorted(got)}, want {sorted(want)}"
    )
    for col, exp in want.items():
        allowed = exp if isinstance(exp, tuple) else (exp,)
        assert got[col] in allowed, (
            f"{table}.{col}: physical type drifted to {got[col]!r} "
            f"(expected one of {allowed}) — update the readers listed in "
            "this file's docstring along with this contract"
        )
