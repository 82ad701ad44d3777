#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir in
outDir, run its oracle SQL in DuckDB over the sf tables and compare
(sorted-columns, exact values) against the Spark parquet output."""
import sys, json, glob, math
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return v

results = {}
for name in sorted(oracles):
    try:
        spark_df = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetch_arrow_table()
        oracle_df = con.execute(oracles[name]).fetch_arrow_table()
        scols = sorted(spark_df.column_names)
        ocols = sorted(oracle_df.column_names)
        schema_ok = scols == ocols and all(
            str(spark_df.schema.field(c).type) == str(oracle_df.schema.field(c).type)
            for c in scols if c in ocols)
        rows_ok = spark_df.num_rows == oracle_df.num_rows
        s_rows = list(zip(*[ [canon(x) for x in spark_df.column(c).to_pylist()] for c in scols ])) if scols else []
        o_rows = list(zip(*[ [canon(x) for x in oracle_df.column(c).to_pylist()] for c in ocols ])) if ocols else []
        hash_ok = s_rows == o_rows
        results[name] = {"rows": rows_ok, "schema": schema_ok, "hash": hash_ok,
                         "n_spark": spark_df.num_rows, "n_oracle": oracle_df.num_rows}
        if not hash_ok and rows_ok:
            # show first mismatching row
            for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                if a != b:
                    results[name]["first_diff"] = {"row": i, "spark": a, "oracle": b,
                                                  "cols": scols}
                    break
        if not schema_ok:
            results[name]["spark_schema"] = {c: str(spark_df.schema.field(c).type) for c in scols}
            results[name]["oracle_schema"] = {c: str(oracle_df.schema.field(c).type) for c in ocols}
    except Exception as e:
        results[name] = {"error": str(e)[:500]}

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in oracles:
        try:
            n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
            results[name] = {"rows_only": True, "n": n}
        except Exception as e:
            results[name] = {"error": str(e)[:300]}

ok = sum(1 for r in results.values() if r.get("hash"))
print(f"=== {ok}/{len(oracles)} oracle queries fully match ===")
for name, r in sorted(results.items()):
    status = "OK  " if r.get("hash") else ("ro  " if r.get("rows_only") else "FAIL")
    print(status, name, json.dumps({k: v for k, v in r.items() if k not in ("spark_schema","oracle_schema")}, default=str)[:400])
    if "first_diff" in r:
        print("      diff:", json.dumps(r["first_diff"], default=str)[:600])
    if "spark_schema" in r:
        print("      spark :", r["spark_schema"])
        print("      oracle:", r["oracle_schema"])
