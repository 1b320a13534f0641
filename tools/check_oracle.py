"""Local replica of the driver's correctness harness: run each
queries()[name](sf_dir) and compare to oracle_sql()[name] via DuckDB
(row count + sorted-column value comparison).  Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

import sys

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols).reset_index(drop=True)
    return df


def compare(name, mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if len(mine) != len(oracle):
        problems.append(f"rowcount {len(mine)} vs {len(oracle)}")
        return problems
    m, o = normalize(mine), normalize(oracle)
    if list(m.columns) != list(o.columns):
        problems.append(f"columns {list(m.columns)} vs {list(o.columns)}")
        return problems
    for col in m.columns:
        a, b = m[col].to_numpy(), o[col].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            ok = np.allclose(a.astype(float), b.astype(float),
                             rtol=0, atol=0, equal_nan=True)
            exact = (a.astype(float) == b.astype(float)).all()
            if not exact:
                bad = np.flatnonzero(a.astype(float) != b.astype(float))[:3]
                problems.append(
                    f"col {col}: {len(np.flatnonzero(a != b))} diffs, "
                    f"e.g. idx {bad.tolist()} {a[bad]} vs {b[bad]}")
        else:
            if not (pd.Series(a).astype(str).to_numpy()
                    == pd.Series(b).astype(str).to_numpy()).all():
                bad = np.flatnonzero(pd.Series(a).astype(str).to_numpy()
                                     != pd.Series(b).astype(str).to_numpy())[:3]
                problems.append(f"col {col}: diffs at {bad.tolist()}")
    if m.dtypes.to_dict() != o.dtypes.to_dict():
        problems.append(f"dtypes: {m.dtypes.to_dict()} vs {o.dtypes.to_dict()} (warn)")
    return problems


def run(sf_dir: str, only: set[str] | None = None) -> int:
    """Run the driver-replica correctness harness; returns #failures.
    Importable so pytest can gate the driver contract in CI."""
    only = only or set()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(mine)} rows ({dt:.1f}s)")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            failures += 1
            continue
        problems = compare(name, mine, oracle)
        hard = [p for p in problems if "(warn)" not in p]
        status = "PASS" if not hard else "FAIL"
        if hard:
            failures += 1
        print(f"{status} {name}: {len(mine)} rows ({dt:.1f}s)"
              + ("" if not problems else " | " + "; ".join(problems)))
    print("failures:", failures)
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    return run(sf_dir, set(sys.argv[2:]))


if __name__ == "__main__":
    raise SystemExit(1 if main() else 0)
