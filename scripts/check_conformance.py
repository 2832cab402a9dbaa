"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at the given sf and compares against its
oracle_sql() twin via DuckDB: row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns, floats rounded). Queries without SQL get a rows-only line.

Usage: python scripts/check_conformance.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(4)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            h.update(np.ascontiguousarray(col.to_numpy()).tobytes())
        else:
            h.update("\x1f".join(map(str, col.tolist())).encode())
    return h.hexdigest()[:16]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from freshonions_torscraper_ray.pipelines.oracle_sqls import ORACLE_SQL
    from freshonions_torscraper_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    report: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            report[name] = {"status": "fail", "err": f"{type(e).__name__}: {e}"}
            n_fail += 1
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"ROWS {name}: {len(mine)} rows (no oracle)")
            report[name] = {"status": "rows_only", "rows": len(mine)}
            n_rowsonly += 1
            continue
        try:
            oracle = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            report[name] = {"status": "fail", "err": f"oracle: {e}"}
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(oracle):
            problems.append(f"rows {len(mine)} != {len(oracle)}")
        if list(mine.columns) != list(oracle.columns):
            problems.append(f"cols {list(mine.columns)} != {list(oracle.columns)}")
        elif value_hash(mine) != value_hash(oracle):
            problems.append("value hash mismatch")
            merged = mine.compare(oracle) if len(mine) == len(oracle) else None
            if merged is not None and len(merged):
                problems.append(f"first diffs:\n{merged.head(5)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
            report[name] = {"status": "fail", "err": "; ".join(str(p) for p in problems)}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows")
            report[name] = {"status": "pass", "rows": len(mine)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "n_rows_only": n_rowsonly, "queries": report},
                f, indent=1,
            )
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
