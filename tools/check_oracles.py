"""Driver-style oracle check: run queries() vs oracle_sql() at a given sf and
compare rows / schema (column names) / order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
        if df.shape[1] == 0:
            # Ray's to_pandas drops column names at 0 rows; rebuild the
            # typed empty frame from the Dataset schema (queries that can
            # return no rows anchor a typed empty block, see schema_anchor)
            sch = res.schema(fetch_if_missing=True)
            if sch is not None and sch.names:
                df = pa.schema(
                    list(zip(sch.names, sch.types))
                ).empty_table().to_pandas()
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append("|".join(_norm(v) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    # static-SQL oracles that embed a cache path derive it from this
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, sql in sqls.items():
        if only and name not in only:
            continue
        ours = to_pandas(qs[name](sf_dir))
        theirs = con.sql(sql).df()
        rows_ok = len(ours) == len(theirs)
        schema_ok = sorted(ours.columns) == sorted(theirs.columns)
        hash_ok = schema_ok and value_hash(ours) == value_hash(theirs)
        status = "OK " if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {len(ours)}/{len(theirs)} schema={schema_ok} hash={hash_ok}")
        if status == "FAIL" and schema_ok and rows_ok:
            merged = ours.merge(theirs, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(10))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
