#!/usr/bin/env python3
"""Local replica of the driver's t2 check: read each Verify output parquet,
run the matching oracle SQL in DuckDB over the same testdata tables, and
compare row counts, schemas (loosely), and values (exactly, after sorting
columns by name). Dev tool only — not part of the shipped library.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [namePrefixes]
  namePrefixes: optional comma-separated query-name prefixes (same
  contract as Verify's third arg) to check a subset / resume after a
  heavy query.

Preflight mode (no Spark outputs needed):
  python3 tools/check_oracle.py --explain <sfDir> <oracleSqlJsonDir>
  EXPLAINs every oracle-SQL entry against this DuckDB build so a
  binder/dialect error (the q356 lateral-generate_series class) fails
  HERE, not at the driver's gate where the query would silently go
  unverified. Produce the input with
  `graft.Verify <sfDir> <outDir> --sql-only` (dumps all 358 entries
  without executing any Spark query). The mode self-tests: a
  deliberately-lateral canary must FAIL to bind, proving the preflight
  actually catches that class on this DuckDB version.
"""
import sys, json, glob, os, tempfile
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # Bounded memory + spill: a heavy oracle (list-building window at a
    # big SF) must spill to disk, not draw the OOM killer.
    con.execute("SET memory_limit='24GB'")
    con.execute(f"SET temp_directory='{tempfile.gettempdir()}/duckdb_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    prefixes = [p for p in (only or "").split(",") if p]
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        try:
            rel = con.sql(oracle[name])
            # Dtype lint (the q88 trap): DuckDB widens sum(BIGINT) /
            # count_if / FILTER-sums to HUGEINT, and pandas renders that
            # as float64 ("500.0"), so the driver's value-hash diverges
            # from Spark's BIGINT even though compare() below (via
            # convert_dtypes) masks it. Fail LOUDLY here instead: any
            # oracle column typed HUGEINT/DECIMAL while the Spark side
            # is integral needs an explicit CAST(... AS BIGINT).
            lint = dtype_lint(got, rel.columns, [str(t) for t in rel.types])
            exp = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}");  n_fail += 1;  continue
        if lint:
            print(f"FAIL {name}: {lint}");  n_fail += 1;  continue
        ok, msg = compare(got, exp)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

# A query shape this DuckDB build (1.0.0) rejects: generate_series with a
# lateral column parameter. If this ever STOPS failing (DuckDB upgrade),
# the canary assertion below alerts that the preflight's coverage changed.
LATERAL_CANARY = ("SELECT g.pos FROM embeddings, "
                  "generate_series(1, len(embedding)) AS g(pos)")

def explain_all(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        con.execute("EXPLAIN " + LATERAL_CANARY)
        print("CANARY FAIL: deliberately-lateral fixture BOUND — this "
              "DuckDB build accepts lateral generate_series; preflight "
              "coverage assumptions changed, review ORACLE_DIALECT.md")
        return 1
    except Exception:
        print("canary ok: lateral generate_series fixture rejected as expected")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            con.execute("EXPLAIN " + oracle[name])
            n_pass += 1
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"== explain preflight: {n_pass} bind, {n_fail} fail ==")
    return 1 if n_fail else 0

def dtype_lint(got, ora_cols, ora_types):
    bad = []
    for col, typ in zip(ora_cols, ora_types):
        if col not in got.columns:
            continue  # column-set mismatch is compare()'s job
        u = typ.upper()
        widened = u == "HUGEINT" or u == "UHUGEINT" or u.startswith("DECIMAL")
        if widened and got[col].dtype.kind in "iu":
            bad.append(f"{col}: oracle {typ} vs spark {got[col].dtype}")
    if bad:
        return ("oracle type widening (driver hash WILL diverge; "
                "CAST(... AS BIGINT) in the oracle SQL; "
                "see tools/ORACLE_DIALECT.md #hugeint): " + "; ".join(bad))
    # The q279 trap: a list/struct/map-typed column on EITHER side makes
    # the driver's pandas sort_values canonicalization crash ('unhashable
    # type: numpy.ndarray') BEFORE any comparison — the query can never
    # be certified. Reject loudly here instead.
    nested = []
    for col, typ in zip(ora_cols, ora_types):
        u = typ.upper()
        if u.endswith("]") or u.startswith("STRUCT") or u.startswith("MAP") \
                or u.startswith("UNION"):
            nested.append(f"{col}: oracle {typ}")
    for col in got.columns:
        s = got[col]
        if s.dtype == object:
            nn = s.dropna()
            if len(nn) and isinstance(nn.iloc[0], (np.ndarray, list, dict)):
                nested.append(f"{col}: spark {type(nn.iloc[0]).__name__} cells")
    if nested:
        return ("non-atomic output column (driver sort_values WILL crash; "
                "reduce to a '|'-joined string or checksum; "
                "see tools/ORACLE_DIALECT.md #arrays): " + "; ".join(nested))
    return None

def compare(got, exp):
    if len(got) != len(exp):
        return False, f"row count {len(got)} != {len(exp)}"
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        return False, f"columns {gc} != {ec}"
    for c in gc:
        g, e = got[c], exp[c]
        # A nullable integer column becomes float64 in pandas ('5.0' vs '5'
        # under astype(str)); convert_dtypes restores Int64 where possible
        # so the string compare below sees matching renderings.
        if g.dtype.kind == 'f' and e.dtype.kind in 'iu':
            g = g.convert_dtypes()
        if e.dtype.kind == 'f' and g.dtype.kind in 'iu':
            e = e.convert_dtypes()
        try:
            if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                ga = g.astype(float).to_numpy(); ea = e.astype(float).to_numpy()
                same = (ga == ea) | (np.isnan(ga) & np.isnan(ea))
                if not same.all():
                    i = int(np.argmin(same))
                    return False, f"col {c} row {i}: {ga[i]!r} != {ea[i]!r} (diff {ga[i]-ea[i]!r})"
            else:
                gs = g.astype(str).to_numpy(); es = e.astype(str).to_numpy()
                if not (gs == es).all():
                    i = int(np.argmin(gs == es))
                    return False, f"col {c} row {i}: {gs[i]!r} != {es[i]!r} (dtypes {g.dtype}/{e.dtype})"
        except Exception as ex:
            return False, f"col {c}: compare error {ex} (dtypes {g.dtype}/{e.dtype})"
    return True, ""

if __name__ == "__main__":
    if sys.argv[1] == "--explain":
        sys.exit(explain_all(sys.argv[2], sys.argv[3]))
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
