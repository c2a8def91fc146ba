#!/usr/bin/env python3
"""Generate tools/type_manifest.json: the declared column->type contract
for every oracled query, derived from the DuckDB oracle SQL via DESCRIBE
(binder-only — nothing executes) and expressed in Spark simpleString
type names.

The manifest closes the type-contract loop in BOTH directions:
 - graft.TypeContractSpec (sbt test) asserts each SparkEntry.queries
   result schema matches the manifest — Spark-side type drift (a dropped
   cast) fails in-suite, before any driver run;
 - tools/check.py asserts the manifest still matches the oracle's
   DESCRIBE types — oracle-side drift (a bare sum() flipping to HUGEINT)
   fails the local verify gate, and generation itself refuses
   non-portable types, so a bare sum() oracle can never be manifested.

Usage: python3 tools/gen_type_manifest.py <sfDir> <verifyOutDir>
(reads <verifyOutDir>/oracle_sql.json from the last Verify run)
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB DESCRIBE type -> Spark DataType.simpleString. Only the portable
# subset the repo's oracle convention allows; anything else (HUGEINT,
# DECIMAL from a bare sum(), TIMESTAMP WITH TIME ZONE, ...) is a
# generation ERROR, not a manifest entry.
PORTABLE = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}


def spark_type(duck_type: str, query: str, col: str) -> str:
    t = duck_type.strip()
    if t.endswith("[]"):
        return f"array<{spark_type(t[:-2], query, col)}>"
    if t in PORTABLE:
        return PORTABLE[t]
    raise SystemExit(
        f"ERROR {query}.{col}: oracle type {duck_type} is not in the "
        "portable contract (bare sum()/HUGEINT? missing CAST?) — fix the "
        "oracle SQL, do not widen the manifest")


def manifest(con, oracle: dict) -> dict:
    out = {}
    for name, sql in sorted(oracle.items()):
        desc = con.sql(f"DESCRIBE {sql}").fetchall()
        out[name] = {row[0]: spark_type(row[1], name, row[0])
                     for row in desc}
    return out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    m = manifest(con, oracle)
    with open("tools/type_manifest.json", "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote tools/type_manifest.json: {len(m)} queries, "
          f"{sum(len(v) for v in m.values())} columns")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
