"""Local mimic of the driver's correctness gate: run each queries() entry
and compare against oracle_sql() via DuckDB (row count + schema + order-
insensitive value hash with columns sorted by name)."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(df.astype(str).apply(lambda r: "|".join(r.values), axis=1).tolist())
    return hashlib.sha1("\n".join(rows).encode()).hexdigest()[:16]


def main(sf_dir: str, only: set[str] | None = None, skip_entry: bool = False) -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    if not skip_entry:
        e = mod.entry()
        print(f"entry(): {len(to_pandas(e))} rows OK")

    oracles = mod.oracle_sql()
    failures = 0
    for name, fn in mod.queries().items():
        if only and name not in only:
            continue
        got = to_pandas(fn(sf_dir))
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_cols and value_hash(got) == value_hash(want)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name}: {status} rows {len(got)}/{len(want)} cols {sorted(got.columns)} vs {sorted(want.columns)} hash_eq={ok_hash}")
        else:
            print(f"{name}: OK ({len(got)} rows)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only_arg = next((a for a in sys.argv[1:] if a.startswith("--only=")), None)
    sys.exit(
        main(
            args[0] if args else "/root/testdata/sf0.01",
            only=set(only_arg.split("=", 1)[1].split(",")) if only_arg else None,
            skip_entry="--skip-entry" in sys.argv,
        )
    )
