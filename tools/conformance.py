"""Local stand-in for the driver's correctness gate: run every
__ray_entry__.queries() entry and its oracle_sql() twin on the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/conformance.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(x):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(x, ray.data.Dataset):
            return x.to_pandas()
    except ImportError:
        pass
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # synth-corpus oracles (transcripts_bm25, tool_propagation) pin a scale
    # factor in their read_parquet paths; align it with the dir under test
    import os

    os.environ.setdefault("GRAFT_ORACLE_SF", Path(sf_dir).name.replace("sf", ""))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    sqls = E.oracle_sql()
    # GRAFT_CONFORMANCE_SUBSET: smoke mode for a constrained budget —
    # an integer N runs the first N queries (registry order), a comma
    # list names them.  Default runs the full surface (wall time at
    # sf0.01 is documented in BASELINE.md; per-query timings print below
    # so the budget stays observable).
    subset = os.environ.get("GRAFT_CONFORMANCE_SUBSET", "")
    if subset and not only:
        if subset.isdigit():
            only = set(list(qs)[: int(subset)])
        else:
            only = {s.strip() for s in subset.split(",") if s.strip()}
    import time as _time

    failures = []
    t_all = _time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_q = _time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[ERR ] {name}: engine raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"[rows] {name}: {len(mine)} rows (rows-only check) "
                  f"[{_time.time() - t_q:.1f}s]")
            continue
        try:
            oracle = canon(con.execute(sqls[name]).df())
        except Exception as e:
            print(f"[ERR ] {name}: oracle raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_rows = len(mine) == len(oracle)
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_vals = ok_rows and ok_cols and mine.equals(oracle)
        status = "OK  " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"[{status}] {name}: rows {len(mine)} vs {len(oracle)}, "
              f"cols {ok_cols}, vals {ok_vals} [{_time.time() - t_q:.1f}s]")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                neq = ~(mine == oracle).all(axis=1)
                print("  first diffs (mine | oracle):")
                print(pd.concat([mine[neq].head(3), oracle[neq].head(3)], axis=1))
            else:
                print("  mine cols:", list(mine.columns), "oracle cols:", list(oracle.columns))
                print(mine.head(3)); print(oracle.head(3))
    ray.shutdown()
    print(f"total wall: {_time.time() - t_all:.1f}s")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all conformance checks passed")


if __name__ == "__main__":
    main()
