"""Drive the driver contract exactly as the driver would: vanilla session,
entry() smoke, every queries() entry vs oracle_sql() via DuckDB."""
import sys, hashlib
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

TZ = sys.argv[1] if len(sys.argv) > 1 else None
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

b = SparkSession.builder.master("local[8]").appName("driver-sim")
if TZ:
    b = b.config("spark.sql.session.timeZone", TZ)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
n = len(df.collect())
print(f"entry(): {n} rows, schema={[f.name for f in df.schema.fields]}")

import duckdb, math, pandas as pd
from datetime import datetime, date
con = duckdb.connect()
from pathlib import Path
for p in sorted(Path(SF).glob("*.parquet")):
    con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False, name=None):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append(None)
            elif isinstance(v, float):
                out.append(f"{v:.10g}")
            elif isinstance(v, (datetime, date, pd.Timestamp)):
                out.append(pd.Timestamp(v).isoformat())
            else:
                out.append(v)
        rows.append(tuple(out))
    return sorted(rows, key=repr)

qs, oracles = e.queries(), e.oracle_sql()
# the real driver runs oracle compares at sf0.01 ONLY; entries whose
# oracle reads an engine-exported artifact keyed to sf0.01 (catalog tag
# "oracle-sf0.01") degrade to rows-only at other SFs in this simulator
if Path(SF).name != "sf0.01":
    from rust_evm_indexer_spark.catalog import CATALOG
    for name, entry in CATALOG.items():
        if "oracle-sf0.01" in entry.tags:
            oracles.pop(name, None)
fails = []
for name, fn in sorted(qs.items()):
    got = fn(spark, SF).toPandas()
    if name not in oracles:
        print(f"  {name}: rows-only, {len(got)} rows")
        continue
    want = con.execute(oracles[name]).df()
    ok = sorted(got.columns) == sorted(want.columns) and len(got) == len(want) and canon(got) == canon(want)
    print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} ({len(got)} rows)")
    if not ok:
        fails.append(name)
        if sorted(got.columns) != sorted(want.columns):
            print("    cols:", sorted(got.columns), "vs", sorted(want.columns))
        else:
            a, b2 = canon(got), canon(want)
            diff = [i for i, (x, y) in enumerate(zip(a, b2)) if x != y][:2]
            for i in diff:
                print("    spark :", a[i]); print("    oracle:", b2[i])
print("RESULT:", "ALL MATCH" if not fails else f"FAILS: {fails}")
sys.exit(1 if fails else 0)
