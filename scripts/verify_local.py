#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate:
runs each oracle SQL in DuckDB over the sf parquet tables and compares
(column-name-sorted, row-sorted) with the engine's parquet output."""
import datetime
import sys, json, glob, duckdb, pandas as pd, numpy as np


def _dates_as_datetime(s):
    """DATE columns diverge by HARNESS, not by engine: duckdb>=1.0's
    .df() returns datetime64[us] for DATE while pandas reads parquet
    date32 back as object-dtype datetime.date — the same values. The
    DRIVER comparator accepts that pairing (r17: these queries are
    hash-green), so normalize REAL date objects to datetime64 before
    the strict dtype-kind check. Strings stay strings — a string column
    against a timestamp oracle is still a schema mismatch."""
    if s.dtype == object:
        nn = s.dropna()
        # ALL values, not a head sample (r18 advice): a mixed column
        # (date objects early, strings later) must NOT be normalized —
        # pd.to_datetime would coerce the tail and mask a real
        # engine-vs-oracle type mismatch the driver comparator flags
        if len(nn) and all(
            isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
            for v in nn
        ):
            return pd.to_datetime(s)
    return s

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails.append(name); continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no engine output"); fails.append(name); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            fails.append(name); continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails.append(name); continue
        exp = exp.sort_values(list(exp.columns), ignore_index=True)
        got = got.sort_values(list(got.columns), ignore_index=True)
        ok = True
        for c in exp.columns:
            e, g = _dates_as_datetime(exp[c]), _dates_as_datetime(got[c])
            # timestamp compare: the DRIVER is strict about tz-awareness (a
            # tz-aware engine column vs the oracle's naive one is a schema
            # mismatch there — the round-10 regression), so flag any awareness
            # disagreement as a FAIL instead of normalizing it away
            if str(e.dtype).startswith("datetime") or str(g.dtype).startswith("datetime"):
                # driver parity: a STRING column against the oracle's
                # timestamp is a schema mismatch there — pd.to_datetime
                # would silently parse it into a local PASS
                if not (str(e.dtype).startswith("datetime") and str(g.dtype).startswith("datetime")):
                    print(f"FAIL {name}: col {c} dtype kind differs "
                          f"(exp_dtype={e.dtype} got_dtype={g.dtype}) — driver schema mismatch")
                    ok = False; continue
                e = pd.to_datetime(e); g = pd.to_datetime(g)
                e_tz = getattr(e.dtype, "tz", None); g_tz = getattr(g.dtype, "tz", None)
                if (e_tz is None) != (g_tz is None):
                    print(f"FAIL {name}: col {c} tz-awareness differs "
                          f"(exp_dtype={e.dtype} got_dtype={g.dtype}) — driver schema mismatch")
                    ok = False; continue
                if e_tz is not None: e = e.dt.tz_localize(None)
                if g_tz is not None: g = g.dt.tz_localize(None)
                e = e.astype("datetime64[ns]"); g = g.astype("datetime64[ns]")
                same = e.equals(g)
            elif e.dtype.kind == "f" or g.dtype.kind == "f":
                # driver parity: numeric-vs-numeric only — a STRING column
                # against the oracle's float is a schema mismatch there,
                # and astype(float) would silently parse it into a PASS
                if not (e.dtype.kind in "fiu" and g.dtype.kind in "fiu"):
                    print(f"FAIL {name}: col {c} dtype kind differs "
                          f"(exp_dtype={e.dtype} got_dtype={g.dtype}) — driver schema mismatch")
                    ok = False; continue
                # tiny atol: ROUND(x,4) values computed in different summation
                # orders can straddle a rounding boundary by one ulp
                same = np.allclose(e.astype(float), g.astype(float), rtol=0, atol=1e-9, equal_nan=True)
            else:
                same = e.astype(object).where(pd.notna(e), None).equals(
                       g.astype(object).where(pd.notna(g), None))
            if not same:
                mism = None
                try:
                    neq = ~(e.astype(object).where(pd.notna(e), None) ==
                            g.astype(object).where(pd.notna(g), None))
                    idx = np.where(neq)[0][:3]
                    mism = [(int(i), e.iloc[i], g.iloc[i]) for i in idx]
                except Exception: pass
                print(f"FAIL {name}: col {c} differs (exp_dtype={e.dtype} got_dtype={g.dtype}) sample={mism}")
                ok = False
        if ok: print(f"PASS {name} ({len(exp)} rows)")
        else: fails.append(name)
    except Exception as e:
        # one pathological column (unsortable mixed object key, an
        # uncastable cell) must fail THIS query, not abort the gate
        # with the remaining queries unreported
        print(f"FAIL {name}: compare error: {e}"); fails.append(name)

if not oracle:
    # a typo'd SPARK_GRAFT_ONLY produces an empty oracle set — a green
    # "0/0 pass" would read as a passing gate on zero comparisons
    print("FAIL: no queries compared (empty oracle_sql.json — "
          "typo'd SPARK_GRAFT_ONLY?)")
    sys.exit(1)
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
