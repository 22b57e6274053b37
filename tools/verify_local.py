#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's
parquet dump against its DuckDB oracle over the same tables.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def kinds(df: pd.DataFrame):
    """Column kind signature (int/float/bool/other). The driver hashes
    values dtype-sensitively — e.g. DuckDB integer sum() returns HUGEINT
    which pandas renders as float64, and 8961.0 hashes differently from
    int 8961 even though values compare equal. Catch that here."""
    out = {}
    for c in sorted(df.columns):
        if pd.api.types.is_bool_dtype(df[c]):
            out[c] = "bool"
        elif pd.api.types.is_integer_dtype(df[c]):
            out[c] = "int"
        elif pd.api.types.is_float_dtype(df[c]):
            out[c] = "float"
        else:
            out[c] = "other"
    return out


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for value comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).endswith("ndarray'>") else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"EMPTY-DUMP {name}")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"SKIP(rows-only) {name}: rows={len(got)}")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERROR {name}: {e}")
            n_fail += 1
            continue
        gk, ek = kinds(got), kinds(exp)
        if gk != ek:
            diff = {c: (gk.get(c), ek.get(c)) for c in set(gk) | set(ek)
                    if gk.get(c) != ek.get(c)}
            print(f"FAIL {name}: dtype kinds spark-vs-oracle {diff}")
            n_fail += 1
            continue
        g, e = norm(got.copy()), norm(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: {str(ex)[:500]}")
            n_fail += 1
    missing = set(oracle) - set(names)
    for m in sorted(missing):
        print(f"MISSING-DUMP {m}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only, "
          f"{len(missing)} missing")
    return 1 if (n_fail or missing) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
