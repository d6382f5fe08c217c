"""Driver-style oracle check: run every queries() entry and its
oracle_sql() side-by-side over a given sf dir, compare row count + schema +
order-insensitive values. Usage: python scripts/check_oracle.py [sf_dir]."""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


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


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = np.round(df[c].astype(np.float64), 6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = 0
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            mine = norm(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        el = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only, {el:.1f}s)")
            continue
        try:
            ref = norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
            failures += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: cols {list(mine.columns)} vs "
                  f"{list(ref.columns)}")
            failures += 1
            continue
        if not mine.equals(ref):
            neq = (mine != ref).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} mismatched rows; first:")
            print(pd.concat([mine[neq].head(3), ref[neq].head(3)],
                            keys=["mine", "ref"]))
            failures += 1
            continue
        print(f"ok   {name}: rows={len(mine)} match ({el:.1f}s)")

    if not only:
        e = mod.entry()
        e = to_pandas(e)
        print(f"entry(): {len(e)} rows, cols={list(e.columns)}")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  "/root/testdata/sf0.01",
                  sys.argv[2].split(",") if len(sys.argv) > 2 else None))
