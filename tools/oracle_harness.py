"""Local differential harness mimicking the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet tables, canonicalizes (sort columns by name, order-insensitive
row ordering, round-trip through strings with float rounding), and
compares row counts + value hashes.

Usage:
    python tools/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd

REPO = "/root/repo"
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canonical_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or v != v:  # NaN/None
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    rows = sorted(
        "\x1f".join(norm(v) for v in rec) for rec in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import xetl_spark.queries as Q
    from xetl_spark.session import get_session

    spark = get_session("oracle_harness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = [n for n in Q.REGISTRY if not only or n in only]
    passed, failed, rows_only = [], [], []
    for name in names:
        q = Q.REGISTRY[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failed.append(name)
            continue
        if not q.oracle:
            rows_only.append(name)
            print(f"rows-only  {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(q.oracle).df()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failed.append(name)
            continue
        sh, oh = canonical_hash(sdf), canonical_hash(odf)
        status = "OK " if (sh == oh and len(sdf) == len(odf)) else "MISMATCH"
        print(
            f"{status} {name}: spark={len(sdf)} duck={len(odf)} "
            f"hash={'=' if sh == oh else 'DIFF'} ({time.time()-t0:.1f}s)"
        )
        (passed if status == "OK " else failed).append(name)
        if status != "OK " and len(sdf) and len(odf):
            s = sdf.reindex(sorted(sdf.columns), axis=1)
            o = odf.reindex(sorted(odf.columns), axis=1)
            print("  spark cols:", list(s.columns))
            print("  duck  cols:", list(o.columns))
            print("  spark head:\n", s.head(3).to_string())
            print("  duck  head:\n", o.head(3).to_string())
    print(
        f"\n{len(passed)} ok, {len(failed)} failed, {len(rows_only)} rows-only "
        f"of {len(names)}"
    )
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
