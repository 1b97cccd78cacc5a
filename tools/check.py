#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each <table>.parquet in sfDir as a DuckDB view, runs every
query in oracle_sql.json, loads the Spark result parquet, sorts columns
by name and rows by all columns, and compares cell values.
"""
import json, math, sys
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        # report near-misses distinctly: driver may be exact
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    # decimal vs float etc.
    try:
        import decimal
        if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
            return float(a) == float(b)
    except Exception:
        pass
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != oracle {list(exp.columns)}")
            continue
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            continue
        bad = None
        exact = True
        for ci, c in enumerate(exp.columns):
            ev, gv = exp[c].tolist(), got[c].tolist()
            for ri in range(len(ev)):
                if not cmp_cell(ev[ri], gv[ri]):
                    bad = (ri, c, ev[ri], gv[ri])
                    break
                if norm(ev[ri]) != norm(gv[ri]) and not (
                    isinstance(ev[ri], float) and isinstance(gv[ri], float)
                    and (ev[ri] == gv[ri])):
                    pass
            if bad:
                break
        # exactness pass (hash-style)
        # dtype mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark
        # int64) breaks the driver's value hash even when == passes.
        # only kind-level mismatches (int vs float vs object) break the
        # driver's value hash; int32 vs int64 both surface as Python int.
        for c in exp.columns:
            if exp[c].dtype.kind != got[c].dtype.kind:
                exact = False
                print(f"  dtype {name}.{c}: spark={got[c].dtype} oracle={exp[c].dtype}")
        for c in exp.columns:
            if exp[c].tolist() != got[c].tolist():
                ev, gv = exp[c].tolist(), got[c].tolist()
                diff = [(e, g) for e, g in zip(ev, gv) if (e != g and not (
                    isinstance(e, float) and isinstance(g, float)
                    and math.isnan(e) and math.isnan(g)))]
                if diff:
                    exact = False
        if bad:
            ri, c, e, g = bad
            print(f"FAIL {name}: row {ri} col {c}: spark={g!r} oracle={e!r}")
        else:
            tag = "OK  " if exact else "OK~ (not bit-exact)"
            print(f"{tag} {name}: {len(got)} rows")
            n_ok += 1
    print(f"== {n_ok}/{len(oracle)} queries match")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
