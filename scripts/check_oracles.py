#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library code).

Usage: python3 scripts/check_oracles.py <sfDir> <verifyOutDir>

Replays each oracle_sql.json entry in DuckDB against the sfDir parquet
tables, loads the corresponding Spark parquet result, and compares
rows / schema (sorted column names) / values (rows sorted by all columns,
floats rounded). Mirrors what CORRECTNESS_r{N}.json reports so oracle
regressions are caught before the driver runs.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    return con.execute(
        "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    ).fetchdf()


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        # NULL must stay distinguishable from '' — the driver's gate
        # distinguishes them (r4: q61/q64/q71/x62 red on exactly this
        # axis while this script stayed green). NaN floats collapse to
        # the same sentinel because pandas surfaces SQL NULL numerics
        # as NaN on both the Spark-parquet and DuckDB sides.
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\x00NULL"
        if isinstance(v, float):
            # shortest round-trip repr: bit-exact float compare, matching
            # the repo's integral-output discipline (no 6-sig-fig masking)
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        except Exception:
            pass

    spark_dirs = sorted(
        d.rstrip("/").split("/")[-1]
        for d in glob.glob(f"{out_dir}/*/")
        if not d.rstrip("/").endswith("_manifest")
    )
    results, fails = {}, 0
    for name in spark_dirs:
        r = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        spark_df = load_spark_result(f"{out_dir}/{name}")
        if spark_df is None:
            r["err"] = "no_spark_output"
            fails += 1
            results[name] = r
            continue
        r["spark_rows"] = len(spark_df)
        if name not in oracles:
            r["err"] = "no_oracle"
            results[name] = r
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            r["err"] = f"oracle_sql_error: {e}"
            fails += 1
            results[name] = r
            continue
        r["oracle_rows"] = len(odf)
        r["rows_match"] = len(spark_df) == len(odf)
        r["schema_match"] = sorted(map(str.lower, spark_df.columns)) == \
            sorted(map(str.lower, odf.columns))
        if r["schema_match"]:
            odf.columns = [c.lower() for c in odf.columns]
            spark_df.columns = [c.lower() for c in spark_df.columns]
            r["hash_match"] = canon(spark_df) == canon(odf)
        else:
            r["hash_match"] = False
        if not (r["rows_match"] and r["schema_match"] and r["hash_match"]):
            fails += 1
            a, b = canon(spark_df), canon(odf)
            diff = [x for x in (a[:3] + b[:3]) if (x in a) != (x in b)]
            r["first_diff"] = str(diff[:2])[:300]
        results[name] = r

    for name, r in sorted(results.items()):
        ok = r["err"] == "no_oracle" or (
            r["rows_match"] and r["schema_match"] and r["hash_match"])
        flag = "ok " if ok else "FAIL"
        extra = r.get("err") or ""
        print(f"{flag} {name} spark={r.get('spark_rows')} "
              f"oracle={r.get('oracle_rows')} {extra}")
        if not ok and "first_diff" in r:
            print(f"     diff: {r['first_diff']}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
