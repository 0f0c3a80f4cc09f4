#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Verify.scala parquet
dumps (sorted columns, sorted rows, hashed)."""
import json, sys, math
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v): row.append("NaN")
                else: row.append(f"{v:.9g}")
            elif isinstance(v, (list, tuple)):
                row.append(str(list(v)))
            elif v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append("\x01".join(row))
    rows.sort()
    return rows

def dtypes_of(df):
    # the driver's comparator hashes dtypes alongside values (a DuckDB
    # HUGEINT sum lands in pandas as float64 while Spark writes int64 —
    # equal values still hash-mismatch); mirror that here so a local
    # "N pass" is the driver's "N pass". Empirically the driver accepts
    # integer-WIDTH divergence (q_winnow's int32-vs-int64 is green in
    # CORRECTNESS_r14) but rejects KIND divergence (q_bpe_bytes's
    # int64-vs-float64 is the one red row), so compare normalized kinds.
    df = df.reindex(sorted(df.columns), axis=1)
    kind = {"i": "int", "u": "int", "f": "float", "b": "bool",
            "O": "object", "M": "datetime", "m": "timedelta"}
    return [kind.get(t.kind, str(t)) for t in df.dtypes]

ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')").df()
        want = con.sql(sql).df()
        g, w = canon(got), canon(want)
        gt, wt = dtypes_of(got), dtypes_of(want)
        if g == w and gt != wt:
            fail += 1
            print(f"FAIL {name} values match but dtypes differ: "
                  f"got={list(zip(sorted(got.columns), gt))} "
                  f"want={list(zip(sorted(want.columns), wt))}")
        elif g == w:
            print(f"PASS {name} rows={len(g)}")
            ok += 1
        else:
            fail += 1
            print(f"FAIL {name} got_rows={len(g)} want_rows={len(w)} "
                  f"got_cols={sorted(got.columns)} want_cols={sorted(want.columns)}")
            diff_g = [r for r in g if r not in set(w)][:3]
            diff_w = [r for r in w if r not in set(g)][:3]
            for r in diff_g: print(f"  only-got:  {r[:200]}")
            for r in diff_w: print(f"  only-want: {r[:200]}")
    except Exception as e:
        fail += 1
        print(f"ERROR {name}: {str(e)[:300]}")
print(f"\n{ok} pass / {fail} fail")
