"""Determinism across parallelism — the engine-wide analog of the
reference's threadsafe_test (500 concurrent parses must equal the serial
result, test/zensols/nlparse/threadsafe_test.clj:6-21): every registered
query must produce IDENTICAL results at local[8] and local[32].

Usage: python tools/check_determinism.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def run_all(cpus: int) -> dict[str, pd.DataFrame]:
    from clj_nlp_parse_spark import queries as Q
    from clj_nlp_parse_spark.session import get_spark
    spark = get_spark(app_name=f"determinism-{cpus}", parallelism=cpus,
                      shuffle_partitions=cpus)
    out = {}
    for name, fn in Q.QUERIES.items():
        df = fn(spark, SF_DIR).toPandas()
        out[name] = df[sorted(df.columns)].reset_index(drop=True)
    spark.stop()
    return out


def main() -> None:
    a = run_all(8)
    b = run_all(32)
    failures = []
    for name in a:
        x, y = a[name], b[name]
        if x.shape != y.shape or list(x.columns) != list(y.columns):
            failures.append(f"{name}: shape/columns differ")
            continue
        for c in x.columns:
            if x[c].dtype.kind == "f":
                import numpy as np
                same = np.allclose(x[c].fillna(-9e99), y[c].fillna(-9e99))
            else:
                same = x[c].where(pd.notna(x[c]), None).tolist() == \
                    y[c].where(pd.notna(y[c]), None).tolist()
            if not same:
                failures.append(f"{name}.{c}: values differ")
                break
        print(f"== {name}  {'OK' if not any(f.startswith(name) for f in failures) else 'FAIL'}")
    print(f"\nqueries: {len(a)}  FAILURES: {failures or 'none'}")
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
