#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify.scala parquet dump against its DuckDB oracle on the same
testdata. Usage: selfcheck.py <sfDir> <outDir>.

Comparison: sort columns by name, compare row count, column names,
and cell values (exact; floats compared bit-wise after pyarrow read,
mirroring a hash-based driver as closely as we can).

Optional 3rd arg: comma-separated query names (mirror of Verify's
`only` filter). Restricts both the comparison and the crashed-query
reconcile to those names, so iterating on one query against a partial
outDir doesn't report every other oracle entry as a spurious FAIL.
"""
import sys, os, json, glob, time, math
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    # a typo'd/stale name must be an ERROR, not a silent filter-to-
    # nothing that exits 0 having compared nothing
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: unknown query names in filter: {sorted(unknown)}")
        sys.exit(1)
    oracle = {k: v for k, v in oracle.items() if k in only}
fails, passes, skips = [], [], []
seen = set()
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d) or (only is not None and name not in only):
        continue
    seen.add(name)
    files = glob.glob(f"{d}/*.parquet")
    # read the whole directory (pyarrow skips _-prefixed files): a
    # files[0]-only read would silently drop rows if coalesce(1)
    # ever stops holding
    got = pq.read_table(d) if files else None
    if name not in oracle:
        skips.append(name)
        continue
    if got is None:
        # Verify's write died mid-job (overwrite deleted the old
        # output, only _temporary/ remains) — a FAIL, not a crash
        fails.append((name, "no parquet output in result dir"))
        continue
    try:
        t0 = time.time()
        exp = con.sql(oracle[name]).arrow()
        dt = time.time() - t0
        # surface latent oracle blowups (exponential CTE re-eval /
        # spill) even when the values still match — the k_core class
        if dt > 5.0:
            print(f"  [slow-oracle] {name}: {dt:.1f}s — check CTE "
                  f"MATERIALIZED / decimal widths (DESIGN.md round-8)")
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
    if gcols != ecols:
        fails.append((name, f"columns differ: spark={gcols} duck={ecols}"))
        continue
    for c in gcols:
        gt, et = got.schema.field(c).type, exp.schema.field(c).type
        if gt != et:
            print(f"  [type-warn] {name}.{c}: spark={gt} duck={et}")
    if got.num_rows != exp.num_rows:
        fails.append((name, f"rows differ: spark={got.num_rows} duck={exp.num_rows}"))
        continue
    def cells_equal(a, b):
        # NaN == NaN here (a hash-based driver canonicalizes the
        # bit pattern, and Python's != would false-fail it forever);
        # -0.0 vs 0.0 DIFFERS (distinct bit patterns under a hash).
        # Recurses into list/struct cells (pyarrow to_pylist yields
        # lists/dicts) so nested floats get the same treatment.
        if isinstance(a, float) and isinstance(b, float):
            if a != a and b != b:
                return True
            if a == 0.0 and b == 0.0:
                return math.copysign(1, a) == math.copysign(1, b)
            return a == b
        if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
            return len(a) == len(b) and all(
                cells_equal(x, y) for x, y in zip(a, b))
        if isinstance(a, dict) and isinstance(b, dict):
            return a.keys() == b.keys() and all(
                cells_equal(v, b[k]) for k, v in a.items())
        return a == b
    bad = None
    for c in gcols:
        gv = got.column(c).to_pylist()
        ev = exp.column(c).to_pylist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if not cells_equal(a, b):
                bad = f"col {c} row {i}: spark={a!r} duck={b!r} (types {type(a).__name__}/{type(b).__name__})"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

# reconcile: an oracle entry with NO result directory means the
# query threw inside Verify before writing — without this, a crashed
# query vanishes from the comparison and the gate exits 0
for name in sorted(set(oracle) - seen):
    fails.append((name, "oracle present but no result dir (query crashed in Verify?)"))

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"SKIP (no oracle) {len(skips)}: {' '.join(skips)}")
print(f"FAIL {len(fails)}:")
for n, why in fails:
    print(f"  {n}: {why}")
if not passes and not fails:
    print("FAIL: nothing was compared — wrong outDir or empty filter?")
    sys.exit(1)
sys.exit(1 if fails else 0)
