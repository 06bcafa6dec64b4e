"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry via Ray and its ``oracle_sql()`` via DuckDB on the
same sf dir, compare row count + schema + order-insensitive value hash.

Usage: python tools/check_oracle.py [--exact] [sf_dir] [name ...]

``--exact`` additionally hash-compares the canonicalized frames the way
the driver does (sort columns by name, round floats to 6, sort rows,
hash raw values) — rtol-level agreement that fails this is exactly the
float-summation-order flakiness class that turned `u10_join` red in
round 2.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd
import pyarrow as pa


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.decode("utf-8", "replace")
                if isinstance(v, (bytes, bytearray)) else v)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    """Exact hash over the canonicalized frame (driver-style gate)."""
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            h.update(col.to_numpy(dtype="float64").tobytes())
        elif pd.api.types.is_integer_dtype(col):
            h.update(col.to_numpy(dtype="int64").tobytes())
        else:
            h.update(repr(col.tolist()).encode())
    return h.hexdigest()


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    argv = list(sys.argv[1:])
    exact = "--exact" in argv
    json_path = None
    if "--json" in argv:
        json_path = argv[argv.index("--json") + 1]
        del argv[argv.index("--json"):argv.index("--json") + 2]
    argv = [a for a in argv if a != "--exact"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __ray_entry__ as E
    qs, sqls = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"{name:24s} RAY-ERROR {type(e).__name__}: {e}")
            failures.append(name)
            results[name] = {"status": "ray-error", "err": str(e)[:200]}
            continue
        if name not in sqls:
            print(f"{name:24s} rows={len(got)} (rows-only, no oracle)")
            continue
        want = canon(con.execute(sqls[name]).fetchdf())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        # the driver hash-compares raw values, so an int64 column vs a
        # float64 oracle column is a FAIL there even when values match
        # numerically (round-1 salted_agg lesson) — flag kind mismatches
        ok_kinds = ok_cols and all(
            got[c].dtype.kind == want[c].dtype.kind
            or {got[c].dtype.kind, want[c].dtype.kind} <= {"i", "u"}
            for c in got.columns)
        if ok_cols and not ok_kinds:
            bad = [f"{c}:{got[c].dtype}!={want[c].dtype}"
                   for c in got.columns
                   if got[c].dtype.kind != want[c].dtype.kind]
            print(f"{name:24s} DTYPE-MISMATCH {bad}")
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, rtol=1e-5)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
                print(f"{name:24s} VALUE-MISMATCH {msg}")
        ok_exact = True
        if exact and ok_rows and ok_cols and ok_vals:
            ok_exact = value_hash(got) == value_hash(want)
            if not ok_exact:
                print(f"{name:24s} EXACT-HASH-MISMATCH "
                      f"(rtol-equal; float summation-order hazard)")
        status = "OK" if (ok_rows and ok_cols and ok_vals
                          and ok_kinds and ok_exact) else "FAIL"
        results[name] = {
            "status": status.lower(), "rows": len(got),
            "oracle_rows": len(want), "rows_match": ok_rows,
            "schema_match": ok_cols and ok_kinds, "values_match": ok_vals,
            "exact_hash_match": ok_exact if exact else None}
        if status == "FAIL":
            failures.append(name)
            print(f"{name:24s} {status} rows {len(got)}/{len(want)} "
                  f"cols {list(got.columns)} vs {list(want.columns)}")
        else:
            print(f"{name:24s} OK rows={len(got)}")
    ray.shutdown()
    if json_path:
        import json
        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "exact": exact,
                       "registry_order": list(qs),
                       "results": results}, f, indent=1)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
