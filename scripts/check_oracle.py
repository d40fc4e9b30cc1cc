#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata tables and compare (shape, columns, values, row
order) with the parquet dumps Verify wrote. Usage:

    python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name}: no Spark output dir"); fail += 1; continue
    try:
        exp_rel = con.execute(sql)
        exp_arrow = exp_rel.arrow()
        exp = exp_arrow.to_pandas()
    except Exception as e:
        print(f"ORAFAIL  {name}: {str(e)[:160]}"); fail += 1; continue
    got_arrow = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").arrow()
    got = got_arrow.to_pandas()
    # driver semantics: sort columns by name, then compare values
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"COLS     {name}: oracle={list(exp.columns)} spark={list(got.columns)}")
        fail += 1; continue
    # the driver hashes TYPED results: an arrow type mismatch (e.g. DuckDB
    # sum(BIGINT) -> decimal128(38,0) vs Spark int64) fails its gate even
    # when values are equal — compare arrow schemas, not pandas coercions
    tbad = [(c, str(exp_arrow.schema.field(c).type), str(got_arrow.schema.field(c).type))
            for c in exp.columns
            if exp_arrow.schema.field(c).type != got_arrow.schema.field(c).type]
    if tbad:
        c, te, tg = tbad[0]
        print(f"TYPE     {name}: col={c} oracle={te} spark={tg}")
        fail += 1; continue
    if exp.shape != got.shape:
        print(f"SHAPE    {name}: oracle={exp.shape} spark={got.shape}")
        fail += 1; continue
    bad = None
    for c in exp.columns:
        a, b = exp[c].tolist(), got[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            same = (x == y) or (x is None and y is None)
            try:
                import math
                if not same and isinstance(x, float) and isinstance(y, float):
                    same = (math.isnan(x) and math.isnan(y)) or x == y
            except Exception:
                pass
            if not same and str(x) == str(y):
                same = True
            if not same:
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        c, i, x, y = bad
        print(f"VAL      {name}: col={c} row={i} oracle={x!r} spark={y!r}")
        fail += 1
    else:
        print(f"OK       {name} ({exp.shape[0]} rows)")
        ok += 1

# rows-only queries (no oracle): check dir exists and has rows
for d in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in oracle: continue
    n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
    print(f"ROWSONLY {name}: {n} rows")

print(f"\n{ok} ok, {fail} failed, {len(oracle)} oracled")
sys.exit(1 if fail else 0)
