"""Fixture-drift canary.

The driver regenerates /root/testdata per round, and its encodings have
changed before (events.ts flipped from TIMESTAMP(NANOS) int64 to
TIMESTAMP(MICROS) between rounds 1 and 2, silently corrupting every
streaming query that hardcoded the old encoding). This test pins the
*contract* the engine codes against: table presence, column names, and
physical parquet types. When the driver drifts again, this fails first,
with a readable diff, instead of fifteen queries failing obscurely.

Pure pyarrow footer reads — no Spark session, runs in milliseconds.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# column -> pyarrow type string. For columns whose encoding has drifted
# historically, a tuple of accepted encodings (the loaders dtype-probe).
EXPECTED: dict[str, dict[str, object]] = {
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
        "o_orderdate": ("timestamp[us]", "timestamp[ns]"),
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
        "l_shipdate": ("timestamp[us]", "timestamp[ns]"),
    },
    "events": {
        "event_id": "int64",
        "ts": ("timestamp[us]", "timestamp[ns]"),  # loaders probe either
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
        "embedding": ("list<element: float>", "list<item: float>"),
        "label": "int32",
    },
}


def _diff(table: str) -> list[str]:
    path = f"{SF_DIR}/{table}.parquet"
    if not os.path.exists(path):
        return [f"{table}: MISSING file {path}"]
    schema = pq.read_schema(path)
    observed = {f.name: str(f.type) for f in schema}
    want = EXPECTED[table]
    out = []
    for col, accept in want.items():
        ok = (accept,) if isinstance(accept, str) else accept
        got = observed.get(col)
        if got is None:
            out.append(f"{table}.{col}: MISSING (expected {ok})")
        elif got not in ok:
            out.append(f"{table}.{col}: DRIFTED to {got!r} (engine expects one of {ok})")
    for col in observed:
        if col not in want:
            out.append(f"{table}.{col}: NEW column ({observed[col]}) not in contract")
    return out


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_contract(table):
    problems = _diff(table)
    assert not problems, (
        "fixture drift detected — update the dtype-probing loaders "
        "(xetl_spark/queries/__init__.py load(), streaming/windows.py "
        "read_events_stream) and then this contract:\n  "
        + "\n  ".join(problems)
    )


def test_all_scale_factors_consistent():
    """Every sf dir the driver ships must agree on the events.ts
    encoding — a mixed state would mean batch tests pass while the
    bench (sf0.1) reads garbage."""
    encodings = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if os.path.exists(path):
            encodings[sf] = str(pq.read_schema(path).field("ts").type)
    assert len(set(encodings.values())) <= 1, f"mixed ts encodings: {encodings}"
