"""Local mimic of the driver's correctness gate.

Runs each registered Spark query at sf0.01 and its DuckDB oracle SQL
side-by-side, compares row count, schema (column names), and
order-insensitive values (sorted by all columns; doubles compared allclose
AND exactly, so we know whether the driver's value-hash would match).

Usage: python tools/check_oracle.py [--json PATH] [query ...]

With --json PATH, additionally writes a driver-shaped artifact (one record
per checked query: rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err) — the per-round full-registry CORRECTNESS_LOCAL_rN.json
the driver's rotating 50-query sample doesn't provide (VERDICT_r02 #4).
hash_match mirrors the driver's value-hash: EXACT equality, not allclose.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_conn():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame,
            detail: dict | None = None) -> bool:
    """Returns overall ok; if `detail` is passed, fills the driver-shaped
    rows_match / schema_match / hash_match booleans (hash_match = exact
    value equality on every column, the driver's value-hash contract)."""
    detail = detail if detail is not None else {}
    ok = True
    detail["rows_match"] = len(sdf) == len(odf)
    detail["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
    detail["hash_match"] = False
    if len(sdf) != len(odf):
        print(f"  ROWS MISMATCH: spark={len(sdf)} oracle={len(odf)}")
        ok = False
    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"  SCHEMA MISMATCH: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return False
    s, o = norm(sdf), norm(odf)
    if not ok:
        return False
    all_exact = True
    for c in s.columns:
        sv, ov = s[c], o[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            exact = np.array_equal(a, b, equal_nan=True)
            close = np.allclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not exact:
                all_exact = False
                worst = int(np.nanargmax(np.abs(a - b))) if len(a) else 0
                print(f"  col {c}: exact={exact} allclose={close} "
                      f"worst ix={worst} spark={a[worst]!r} oracle={b[worst]!r}")
                ok = ok and close
        else:
            eq = sv.astype(str).equals(ov.astype(str))
            if not eq:
                all_exact = False
                bad = (sv.astype(str) != ov.astype(str))
                i = int(np.argmax(bad.to_numpy()))
                print(f"  col {c}: MISMATCH at sorted ix {i}: "
                      f"spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}")
                ok = False
    detail["hash_match"] = all_exact
    return ok


def main() -> None:
    from clj_nlp_parse_spark import queries as Q
    from clj_nlp_parse_spark.session import get_spark

    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracle.py [--json PATH] [query ...]")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = set(argv)
    spark = get_spark(parallelism=8)
    con = duck_conn()
    failures = []
    records: dict[str, dict] = {}
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        sql = Q.ORACLES.get(name)
        print(f"== {name}")
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        records[name] = rec
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as e:
            print(f"  SPARK ERROR: {e}")
            rec["err"] = f"spark_error: {e}"[:300]
            failures.append(name)
            continue
        if sql is None:
            print(f"  rows-only: {len(sdf)} rows")
            rec["err"] = "no_oracle"
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.execute(sql).df()
            rec["oracle_rows"] = len(odf)
        except Exception as e:
            print(f"  ORACLE ERROR: {e}")
            rec["err"] = f"oracle_error: {e}"[:300]
            failures.append(name)
            continue
        if compare(name, sdf, odf, rec):
            print(f"  OK ({len(sdf)} rows)")
        else:
            failures.append(name)
    spark.stop()
    if json_path:
        import json
        if only and os.path.exists(json_path):
            # subset run: merge into the existing full-registry artifact so
            # incremental re-checks keep it current; stale (unregistered)
            # keys are dropped so the ghost-key contract test stays honest
            with open(json_path) as f:
                merged = json.load(f)
            merged = {k: v for k, v in merged.items() if k in Q.QUERIES}
            merged.update(records)
            records = merged
        with open(json_path, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(records)} queries)")
    print("\nFAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
