#!/usr/bin/env python3
"""Dev-only local oracle check, mimicking the driver's gate:
run Verify's parquet dumps against the oracle SQL in DuckDB and compare
(columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    import os
    # manifest freshness: the committed type contract
    # (tools/type_manifest.json, asserted Spark-side by TypeContractSpec
    # in sbt test) must still match the oracle's DESCRIBE types — an
    # oracle edit that shifts a column type without regenerating the
    # manifest fails here, closing the loop from the DuckDB side.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gen_type_manifest as gtm
    manifest_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "type_manifest.json")
    manifest_stale = 0
    if os.path.exists(manifest_path):
        declared = json.load(open(manifest_path))
        current = gtm.manifest(con, oracle)
        # compare only the queries in THIS run's oracle dump: a filtered
        # Verify (SPARK_GRAFT_VERIFY_ONLY) dumps a subset, and key-set
        # completeness is TypeContractSpec's job, not this pass's
        for q in sorted(current):
            if declared.get(q) != current[q]:
                print(f"FAIL {q}: type manifest stale: declared "
                      f"{declared.get(q)} != oracle {current.get(q)} — "
                      "rerun tools/gen_type_manifest.py")
                manifest_stale += 1
    else:
        print("WARN type_manifest.json missing — run "
              "tools/gen_type_manifest.py")
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if name.startswith("."):  # in-flight attempt scratch dirs
            continue
        if os.path.isdir(d) and name not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                print(f"ROWS {name}: {n} rows (no oracle declared)")
            except Exception as ex:  # noqa: BLE001
                print(f"FAIL {name}: rows-only read failed: {ex}")
    for name, sql in sorted(oracle.items()):
        try:
            got_t = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
            exp_t = con.sql(sql).arrow()
            # dtype-STRICT compare on the ARROW schema, reproducing the
            # driver's type-sensitive hash: a DuckDB HUGEINT
            # (decimal128 in arrow) vs Spark int64 is a FAIL even when
            # every value matches (see q130/q131/q141, r8). Arrow, not
            # pandas dtypes: pandas coerces a NULL-bearing int64 to
            # float64/object AFTER conversion, which would fabricate (or
            # mask) mismatches the driver's schema hash never sees.
            gtypes = {f.name: str(f.type) for f in got_t.schema}
            etypes = {f.name: str(f.type) for f in exp_t.schema}
            got = got_t.to_pandas()
            exp = exp_t.to_pandas()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != "
                      f"{list(e.columns)}")
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} != {len(e)}")
                continue
            diff_cols = []
            dtype_cols = []
            for c in g.columns:
                a, b = g[c], e[c]
                if gtypes[c] != etypes[c]:
                    dtype_cols.append((c, gtypes[c], etypes[c]))
                    continue
                if not a.equals(b):
                    try:
                        same = (a.astype("float64").fillna(-1e308)
                                == b.astype("float64").fillna(-1e308)).all()
                    except (ValueError, TypeError):
                        same = (a.astype(str) == b.astype(str)).all()
                    if not same:
                        diff_cols.append(c)
            if dtype_cols:
                print(f"FAIL {name}: dtype mismatch (spark vs oracle): "
                      f"{dtype_cols}")
            elif diff_cols:
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    mask = g[c].astype(str) != e[c].astype(str)
                    print(g[mask].head(3))
                    print(e[mask].head(3))
            else:
                print(f"OK   {name} ({len(g)} rows)")
                n_ok += 1
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
    print(f"{n_ok}/{len(oracle)} queries match"
          + (f" ({manifest_stale} stale manifest entries)"
             if manifest_stale else ""))
    return 0 if n_ok == len(oracle) and manifest_stale == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
