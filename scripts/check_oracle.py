#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run every
SparkEntry.oracleSql query in DuckDB against the same parquet tables and
compare with the Verify parquet dumps (schema, row count, value hash
after sorting columns by name).

Usage: python3 scripts/check_oracle.py [sfDir] [verifyOut]
"""
import sys, json, glob, hashlib
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # normalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def df_hash(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = ["|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows)

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    except Exception as e:
        fails.append((name, f"spark read: {e}"))
        continue
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}"))
        continue
    sh, sn = df_hash(spark_df)
    dh, dn = df_hash(duck_df)
    scols = sorted((c, str(t)) for c, t in zip(spark_df.columns, spark_df.dtypes))
    dcols = sorted((c, str(t)) for c, t in zip(duck_df.columns, duck_df.dtypes))
    if [c for c, _ in scols] != [c for c, _ in dcols]:
        fails.append((name, f"columns differ: spark={scols} duck={dcols}"))
    elif sn != dn:
        fails.append((name, f"row count differ: spark={sn} duck={dn}"))
    elif sh != dh:
        # find first differing row for debugging
        a = spark_df[sorted(spark_df.columns)]
        b = duck_df[sorted(duck_df.columns)]
        detail = ""
        for i in range(min(len(a), len(b))):
            ra = "|".join(norm_cell(v) for v in a.iloc[i])
            rb = "|".join(norm_cell(v) for v in b.iloc[i])
            if ra != rb:
                detail = f" first diff row {i}: spark={ra!r} duck={rb!r}"
                break
        fails.append((name, "hash mismatch" + detail))
    else:
        print(f"  OK    {name} ({sn} rows)")

rows_only = [n for n in sorted(x.split('/')[-1] for x in glob.glob(f"{OUT}/*") if '.' not in x.split('/')[-1]) if n not in oracle]
for name in rows_only:
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
    status = "OK" if n > 0 else "EMPTY!"
    print(f"  {status:5s} {name} (rows-only, {n} rows)")
    if n == 0:
        fails.append((name, "rows-only query returned 0 rows"))

print()
if fails:
    print(f"{len(fails)} FAILURES:")
    for n, why in fails:
        print(f"  FAIL  {n}: {why}")
    sys.exit(1)
print("all checks passed")
