#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result, runs the matching
oracle_sql.json SQL in DuckDB over views of <sfDir>/*.parquet, and
compares: column-name sets, row counts, and values (columns sorted by
name, rows sorted by all columns, floats rounded to 9 significant-ish
decimals). Exit code = number of failing queries.
"""
import json, math, sys, glob, os
import duckdb

def canon(rows, cols):
    # rows: list of tuples in col order; sort columns by name, then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = 'NaN'
                else: v = f"{v:.9g}"
            elif isinstance(v, (list, tuple)):
                v = json.dumps(v, default=str)
            else:
                v = repr(v)
            rr.append(v)
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, '*.parquet')):
        name = os.path.basename(p)[:-len('.parquet')]
        # driver fixtures are single files; Spark-written corpora (the
        # 10x scale probe's) are directories of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
        # Spark cannot write TIMESTAMP(NANOS): probe corpora carry the
        # fixture's ns-epoch ts as raw int64. Rebuild the us-truncated
        # TIMESTAMP — exactly what DuckDB sees reading the ns fixture —
        # so timestamp-typed oracle SQL binds identically on both.
        ts_type = dict((c[0], c[1]) for c in
                       con.execute(f"DESCRIBE {name}").fetchall()).get('ts')
        if ts_type == 'BIGINT':
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * "
                        f"REPLACE (make_timestamp(ts // 1000) AS ts) "
                        f"FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    fails = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, '*.parquet'))
        if not files:
            print(f"FAIL {name}: no spark result written"); fails += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            gcols = [d[0] for d in got.description]; grows = got.fetchall()
            exp = con.execute(oracle[name])
            ecols = [d[0] for d in exp.description]; erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns spark={sorted(gcols)} oracle={sorted(ecols)}")
            fails += 1; continue
        gc, gr = canon(grows, gcols); ec, er = canon(erows, ecols)
        if len(gr) != len(er):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}"); fails += 1; continue
        if gr != er:
            bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"  cols:   {gc}")
                print(f"  spark:  {gr[i]}")
                print(f"  oracle: {er[i]}")
            fails += 1; continue
        print(f"OK   {name} ({len(gr)} rows)")
    # queries without oracle: rows-only
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d) and name not in oracle:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{fails} failures")
    sys.exit(min(fails, 100))

main()
