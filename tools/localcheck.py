#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/localcheck.py <sfdir> <outdir> [query ...]

Reads <outdir>/<query>/ parquet (written by graft.Verify), runs the
matching SQL from <outdir>/oracle_sql.json in DuckDB over views named
after the testdata tables, and compares:

  - column names (sorted)
  - Arrow column TYPES, normalizing only integer widths (the driver's
    hash demonstrably tolerates int32 vs int64 but NOT e.g. DuckDB's
    HUGEINT -> decimal128(38,0) vs Spark's int64 — that exact gap
    shipped two driver-red rounds while this tool said green)

The oracle result is materialized through `COPY (sql) TO tmp.parquet`
and read back, NOT fetched via Arrow: the driver's gate hashes the
oracle AFTER a parquet round-trip, and DuckDB's parquet writer demotes
HUGEINT to double (no parquet logical type) while the Arrow fetch
reports it as decimal128(38,0). The Arrow path said PASS on a
driver-red query (q_simpson, round 10); the parquet path is
byte-identical to the driver's pipeline.
  - row count
  - cell values, bit-exact by default (every registry query rounds its
    floats, so exactness is achievable and IS the driver's bar).
    Pass --tol for the legacy 1e-9 relative float tolerance when
    triaging a genuinely-divergent query.
"""
import json, sys, glob, math, os, tempfile

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

INT_TYPES = {"int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"}


def norm_type(t):
    """Normalize an Arrow type to the equivalence class the driver's
    type-sensitive hash uses: integer widths collapse, all else exact."""
    s = str(t)
    if s in INT_TYPES:
        return "int"
    return s


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if v is None:
        return None
    return v


def make_eq(tol):
    def eq(a, b):
        a, b = norm(a), norm(b)
        if tol and isinstance(a, float) and isinstance(b, (float, int)):
            if a == b:
                return True
            return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
        return a == b

    return eq


def main():
    args = [a for a in sys.argv[1:] if a != "--tol"]
    tol = 1e-9 if "--tol" in sys.argv[1:] else 0.0
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    eq = make_eq(tol)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {res_dir}")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(res_dir)
        try:
            # Round-trip the oracle through parquet exactly like the
            # driver does — the Arrow fetch types HUGEINT as decimal128
            # while the parquet writer demotes it to double, and the
            # driver hashes the parquet side.
            with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as tf:
                tmp_parquet = tf.name
            try:
                con.execute(f"COPY ({sql}) TO '{tmp_parquet}' (FORMAT PARQUET)")
                duck = pq.read_table(tmp_parquet)
            finally:
                os.unlink(tmp_parquet)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        type_bad = None
        for c in s_cols:
            st = norm_type(spark_tbl.schema.field(c).type)
            dt = norm_type(duck.schema.field(c).type)
            if st != dt:
                type_bad = (c, st, dt)
                break
        if type_bad:
            c, st, dt = type_bad
            print(f"FAIL {name}: col {c} TYPE differs spark={st} duck={dt}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}")
            n_fail += 1
            continue
        srows = spark_tbl.select(s_cols).to_pylist()
        drows = duck.select(s_cols).to_pylist()
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            for c in s_cols:
                if not eq(sr[c], dr[c]):
                    bad = (i, c, sr[c], dr[c])
                    break
            if bad:
                break
        if bad:
            i, c, sv, dv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={sv!r} duck={dv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
