"""Local replica of the driver's correctness gate: run every
queries()[name] at sf0.01 and compare with oracle_sql()[name] via
DuckDB (row count + schema-insensitive sorted-value comparison).

Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex()[:32])
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _dtype_class(dt) -> str:
    """Dtype equivalence class for the strict gate: the driver's value
    hash distinguishes int from float (pandas renders 99111 vs 99111.0),
    so int-vs-float is a FAILURE here even when values are numerically
    equal.  Width within a class (int32 vs int64) hashes identically
    through the driver's sorted-value path, so classes, not exact
    dtypes, are compared."""
    k = dt.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if len(mine) != len(oracle):
        return f"ROWS {len(mine)} vs {len(oracle)}"
    if sorted(mine.columns) != sorted(oracle.columns):
        return f"COLS {sorted(mine.columns)} vs {sorted(oracle.columns)}"
    a, b = norm(mine), norm(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        ka, kb = _dtype_class(av.dtype), _dtype_class(bv.dtype)
        if ka != kb and len(a):
            return (f"DTYPE col={c} engine={av.dtype}({ka}) vs "
                    f"oracle={bv.dtype}({kb})")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.allclose(av.astype(np.float64), bv.astype(np.float64),
                             rtol=0, atol=0, equal_nan=True)
        else:
            ok = bool((av == bv).all())
        if not ok:
            mism = np.flatnonzero(~(av == bv)) if av.dtype.kind != "f" else \
                np.flatnonzero(av.astype(float) != bv.astype(float))
            i = int(mism[0]) if mism.size else 0
            return f"VAL col={c} n_mismatch={mism.size} first@{i}: {av[i]!r} vs {bv[i]!r}"
    return "OK"


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:20s} ENGINE-ERROR {type(e).__name__}: {e}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"{name:20s} rows-only: {len(mine):7d} rows  ({t1-t0:5.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:20s} ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}")
            continue
        verdict = compare(name, mine, want)
        if verdict != "OK":
            failures.append(name)
        print(f"{name:20s} {verdict}  ({len(mine)} rows, engine {t1-t0:5.1f}s, "
              f"oracle {time.time()-t1:5.1f}s)")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
