#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the Verify output dir (<out>/<query>/ parquet + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf dir, and compares:
row count, column names (sorted), and values (columns sorted by name,
rows compared as sorted tuples of repr'd values).

Faithfulness note: BOTH sides are canonicalized through pandas
(fetchdf / read_parquet-equivalent), exactly like the driver. This
matters: DuckDB window/outer sum() over BIGINT yields HUGEINT, which
pandas renders as float64 ("2975.0") while Spark emits int64 ("2975").
A fetchall()-based replica hides that class of mismatch (round-5
lesson: q236/q324/q325/q338 were red on the driver, green locally).

Usage: dev/check.py [--emit PATH] <sfDir> <verifyOutDir> [query ...]

--emit PATH writes a driver-schema correctness artifact: one object per
query with {"rows_match", "schema_match", "hash_match", "err"} — the
exact shape of the driver's CORRECTNESS_r*.json, so a populated local
artifact exists even when the driver-side writer records {} (empty for
rounds 6-8; VERDICT r8 item 1). hash_match here means the canonical
sorted-values comparison passed (the driver hashes the same canonical
form, so the booleans coincide).
"""
import sys, os, json, glob
import duckdb

def canon_df(df):
    # sort columns by name, then rows by full tuple repr of values —
    # values rendered exactly as pandas holds them (driver behavior).
    cols = sorted(df.columns)
    df = df[cols]
    out = []
    for r in df.itertuples(index=False, name=None):
        out.append(tuple(repr(v) for v in r))
    out.sort()
    return cols, out

def main():
    argv = list(sys.argv[1:])
    emit = None
    if argv and argv[0] == "--emit":
        emit = argv[1]
        argv = argv[2:]
    sf, out = argv[0], argv[1]
    only = set(argv[2:])
    report = {}
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    def rec(name, rows_match, schema_match, hash_match, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "err": err}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = f"{out}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            rec(name, False, False, False, "no spark output"); continue
        try:
            gdf = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetchdf()
            edf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            rec(name, False, False, False, str(e)[:300]); continue
        gc, gr = canon_df(gdf)
        ec, er = canon_df(edf)
        if gc != ec:
            print(f"FAIL {name}: cols {gc} vs {ec}"); n_fail += 1
            rec(name, len(gr) == len(er), False, False, f"cols {gc} vs {ec}"); continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}"); n_fail += 1
            rec(name, False, True, False, f"rows {len(gr)} vs {len(er)}"); continue
        if gr != er:
            bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad:
                print(f"  spark : {gr[i]}")
                print(f"  duckdb: {er[i]}")
            n_fail += 1
            rec(name, True, True, False, f"value mismatch at sorted rows {bad}")
            continue
        print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
        rec(name, True, True, True)
    # oracle-less queries (rows-only by design, e.g. q484's zlib-build-
    # specific compressibility screen): Verify still dumped their
    # parquet — record a row so the artifact has exactly
    # |SparkEntry.queries| rows, with hash_match null to mark the
    # weaker check (mirrors the driver's rows-only fallback).
    # The fallback is RESTRICTED to Verify's own declared-query list
    # (queries.json) minus the oracle map — a stale parquet dir left by
    # an earlier run of a renamed/removed query must never inflate the
    # artifact past |SparkEntry.queries|.
    qlist_path = f"{out}/queries.json"
    if not os.path.exists(qlist_path):
        # Verify has written this manifest since round 11; a dump
        # without one is a stale binary — fail LOUDLY rather than
        # silently skipping the rows-only queries (which would shrink
        # the artifact below |SparkEntry.queries| with exit code 0)
        print(f"FAIL: {qlist_path} missing - re-run graft.Verify "
              "(the rows-only fallback needs the declared-query manifest)")
        sys.exit(1)
    declared = set(json.load(open(qlist_path)))
    for pdir in sorted(glob.glob(f"{out}/q*")):
        if not os.path.isdir(pdir):
            continue
        name = os.path.basename(pdir)
        if name in oracle or (only and name not in only):
            continue
        if name not in declared:
            print(f"SKIP {name}: not in declared query list (stale output dir?)")
            continue
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output (rows-only)"); n_fail += 1
            rec(name, False, None, None, "rows-only by design; no spark output")
            continue
        nrows = con.execute(f"SELECT count(*) FROM '{pdir}/*.parquet'").fetchone()[0]
        ok = nrows > 0
        print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only by design, {nrows} rows)")
        if ok: n_pass += 1
        else: n_fail += 1
        rec(name, ok, None, None, "rows-only by design")
    if emit:
        with open(emit, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"== emitted {len(report)} rows -> {emit} ==")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
