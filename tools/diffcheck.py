#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/diffcheck.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers DuckDB views over the
parquet tables in <sfDir>, runs each oracle SQL, and compares against the
Spark result parquet in <verifyOutDir>/<name>/. Reports per-query
row-count / schema / value match.
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, sf_dir, out_dir, con):
    sql = ORACLE[name]
    spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not spark_files:
        return f"FAIL {name}: no spark output"
    spark = con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").fetch_arrow_table()
    try:
        oracle = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        return f"FAIL {name}: oracle error: {e}"
    sc = sorted(spark.column_names)
    oc = sorted(oracle.column_names)
    if sc != oc:
        return f"FAIL {name}: columns spark={sc} oracle={oc}"
    if spark.num_rows != oracle.num_rows:
        return f"FAIL {name}: rows spark={spark.num_rows} oracle={oracle.num_rows}"
    # Driver-representation probe: the real gate round-trips both frames
    # through pandas and SORTS by every column before hashing; an array or
    # map cell raises TypeError there (round 5: embed_quantize shipped
    # array<int> — green here, red at the gate, all round). Reproduce the
    # sort so a representation the driver cannot hash fails HERE too.
    # TypeError on multi-column sorts (unhashable in factorize); ValueError
    # on single-column sorts (ndarray comparison is ambiguous in argsort)
    try:
        s_pd = spark.to_pandas().sort_values(by=sc)
        o_pd = oracle.to_pandas().sort_values(by=oc)
    except (TypeError, ValueError) as e:
        return f"FAIL {name}: driver-style pandas sort would fail: {e}"
    # Dtype probe (round 15): the driver's hash is dtype-KIND-sensitive —
    # equal VALUES in different pandas dtype kinds still fail the gate.
    # DuckDB types uncast SUM(int) as HUGEINT (arrow decimal128(38,0) →
    # pandas object), while Spark emits int64 — the r14 board had four
    # such reds that this value-compare passed. Width differences within
    # a kind (int32 vs int64) hash identically at the driver (18 r14-green
    # keys carry them), so compare pandas dtype.kind per column, and for
    # object columns (where Decimal == int compares True in Python) also
    # the python type of the first non-null cell.
    for c in sc:
        sd, od = s_pd[c].dtype.kind, o_pd[c].dtype.kind
        if sd != od:
            return (f"FAIL {name}: col {c} dtype kind spark={s_pd[c].dtype} oracle={o_pd[c].dtype} "
                    f"(arrow: spark={spark.schema.field(c).type} "
                    f"oracle={oracle.schema.field(c).type})")
        if sd == "O":
            # compare the SET of cell python types over the whole column
            # (ADVICE r15: a mixed-type object column — Decimal in some
            # rows, int in others — passed the first-cell probe yet fails
            # the driver hash; Decimal(5) == 5 is True so the value loop
            # can never catch it)
            sv = s_pd[c].dropna()
            ov = o_pd[c].dropna()
            if len(sv) and len(ov):
                ta = sorted({type(v).__name__ for v in sv})
                tb = sorted({type(v).__name__ for v in ov})
                if ta != tb:
                    return (f"FAIL {name}: col {c} object cell types "
                            f"spark={ta} oracle={tb} (arrow: "
                            f"spark={spark.schema.field(c).type} "
                            f"oracle={oracle.schema.field(c).type})")
    s_rows = spark.select(sc).to_pylist()
    o_rows = oracle.select(oc).to_pylist()
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        for c in sc:
            va, vb = norm_cell(a[c]), norm_cell(b[c])
            if va != vb:
                if isinstance(va, float) and isinstance(vb, float):
                    return (f"FAIL {name}: row {i} col {c}: "
                            f"spark={va!r} oracle={vb!r} diff={va-vb:.3e}")
                return (f"FAIL {name}: row {i} col {c}: "
                        f"spark={va!r} ({type(va).__name__}) "
                        f"oracle={vb!r} ({type(vb).__name__})")
    return f"OK   {name}: {spark.num_rows} rows"


if __name__ == "__main__":
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    ORACLE = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    names = sorted(n for n in ORACLE if not only or n in only)
    fails = 0
    for n in names:
        r = compare(n, sf_dir, out_dir, con)
        print(r)
        if r.startswith("FAIL"):
            fails += 1
    print(f"\n{len(names) - fails}/{len(names)} oracle queries match")
    sys.exit(1 if fails else 0)
