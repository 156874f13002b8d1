#!/usr/bin/env python3
"""Two-lane sf100 soak driver (diagnostic tooling, driver-side stack).

Lane V (Spark verify): one JVM per query (soak_scale.sh's committed
per-query-JVM + zstd design), serial, never waits; records per-query
wall seconds to <out>/walls.json.
Lane O (DuckDB oracle): polls for completed dumps (_SUCCESS) and runs
`selfcheck.py --tier=scale` one query at a time, but only while free
disk >= GUARD_GB — the round-10 session lost four heavy oracles to
OOM-kill/ENOSPC when a heavy oracle spilled concurrently with a heavy
verify spill on the single sandbox disk; the guard serializes exactly
those collisions and nothing else.

Usage: soak_lanes.py <sfDir> <outDir> <q1,q2,...> [--skip-verify=a,b]
       [--walls-only]
  --skip-verify: queries whose oracle should run against an existing
  dump without re-running Spark (resume support).
  --walls-only: verify lane only — measure per-query walls, skip the
  oracle lane (for a decade-table baseline leg whose correctness is
  already proven at this SF).
Results: <out>/walls.json, <out>/oracle_results.json, per-query logs.
"""
import json, os, shutil, signal, subprocess, sys, threading, time

GUARD_GB = 32      # oracle lane won't START a query below this
LOW_GB = 24        # a RUNNING oracle is paused (SIGSTOP) below this
RESUME_GB = 40     # ... and resumed (SIGCONT) above this (hysteresis)

sfdir, outdir = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
queries = sys.argv[3].split(",")
skip_verify = set()
walls_only = False
for a in sys.argv[4:]:
    if a.startswith("--skip-verify="):
        skip_verify = set(a.split("=", 1)[1].split(","))
    elif a == "--walls-only":
        walls_only = True
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(outdir, exist_ok=True)

jars = [p for p in os.listdir(os.path.join(repo, "target/scala-2.13"))
        if p.endswith(".jar") and "-tests" not in p]
assert jars, "run sbt package first"
jar = os.path.join(repo, "target/scala-2.13", jars[0])

OPENS = [f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in
         ("java.lang java.lang.invoke java.lang.reflect java.io "
          "java.net java.nio java.util java.util.concurrent "
          "java.util.concurrent.atomic sun.nio.ch sun.nio.cs "
          "sun.security.action sun.util.calendar").split()]
HEAP = os.environ.get("SOAK_HEAP", "48g")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

walls_path = os.path.join(outdir, "walls.json")
oracle_path = os.path.join(outdir, "oracle_results.json")
walls = json.load(open(walls_path)) if os.path.exists(walls_path) else {}
oracles = json.load(open(oracle_path)) if os.path.exists(oracle_path) else {}
lock = threading.Lock()


def save(path, obj):
    tmp = path + ".tmp"
    json.dump(obj, open(tmp, "w"), indent=1)
    os.replace(tmp, path)


def free_gb():
    return shutil.disk_usage("/").free / 1e9


def dumped(q):
    return os.path.exists(os.path.join(outdir, q, "_SUCCESS"))


def run_guarded(cmd, log, **kw):
    """DURING-run disk guard (VERDICT r11 #4): the START-only free-disk
    check lost four oracles and two verify queries to ENOSPC from
    spill that GREW after the check (the 40 GB jaccard-pruned oracle
    spill at sf100). Poll free disk while the child runs; below
    LOW_GB, SIGSTOP it so its spill stops growing and the verify lane
    (which keeps disk priority) can drain; SIGCONT above RESUME_GB —
    or as soon as the verify lane is done, since then the paused
    child is the only writer left and waiting can't free anything.
    Returns (rc, paused_seconds).

    Signals go to the child's PROCESS GROUP (start_new_session +
    killpg, ADVICE r12): if selfcheck ever forks workers, a
    pid-targeted SIGSTOP would pause only the parent while children
    keep writing spill. The try/finally guarantees no child is left
    SIGSTOPped holding its spill if this driver itself dies or is
    interrupted while the child is paused."""
    p = subprocess.Popen(cmd, stdout=log, stderr=log,
                         start_new_session=True, **kw)
    paused, stopped, t_stop = 0.0, False, 0.0
    try:
        while True:
            try:
                rc = p.wait(timeout=10)
                break
            except subprocess.TimeoutExpired:
                pass
            f = free_gb()
            if not stopped and f < LOW_GB and vt.is_alive():
                os.killpg(p.pid, signal.SIGSTOP)
                stopped, t_stop = True, time.time()
                print(f"[guard] paused oracle pgid {p.pid} "
                      f"(free {f:.0f}GB < {LOW_GB}GB)", flush=True)
            elif stopped and (f >= RESUME_GB or not vt.is_alive()):
                os.killpg(p.pid, signal.SIGCONT)
                stopped = False
                paused += time.time() - t_stop
                print(f"[guard] resumed oracle pgid {p.pid} "
                      f"(free {f:.0f}GB)", flush=True)
    finally:
        if stopped:
            try:
                os.killpg(p.pid, signal.SIGCONT)
            except ProcessLookupError:
                pass
    return rc, paused


def verify_lane():
    env = dict(os.environ, SPARK_GRAFT_CPUS=CPUS)
    for q in queries:
        if q in skip_verify or (dumped(q) and q in walls):
            continue
        if dumped(q):  # dump from a prior partial run without a wall
            continue
        t0 = time.time()
        log = open(os.path.join(outdir, f"{q}.verify.log"), "w")
        rc = subprocess.call(
            ["java", *OPENS, f"-Xmx{HEAP}", "-Dspark.ui.enabled=false",
             "-Dspark.sql.session.timeZone=UTC",
             "-Dspark.io.compression.codec=zstd",
             "-cp", f"{jar}:/opt/spark/jars/*", "graft.Verify",
             sfdir, outdir, q],
            stdout=log, stderr=log, cwd=repo, env=env)
        wall = round(time.time() - t0, 1)
        with lock:
            if rc == 0 and dumped(q):
                walls[q] = wall
                save(walls_path, walls)
                print(f"[V] {q}: {wall}s", flush=True)
            else:
                print(f"[V] {q}: FAILED rc={rc} after {wall}s "
                      f"(free {free_gb():.0f}GB)", flush=True)


def oracle_lane():
    pending = [q for q in queries if oracles.get(q, {}).get("status")
               != "PASS"]
    while pending:
        ran = False
        for q in list(pending):
            if not dumped(q):
                continue
            while free_gb() < GUARD_GB:
                time.sleep(30)
            t0 = time.time()
            log = open(os.path.join(outdir, f"{q}.oracle.log"), "w")
            rc, paused = run_guarded(
                ["python3", "scripts/selfcheck.py", "--tier=scale",
                 sfdir, outdir, q], log, cwd=repo,
                env=dict(os.environ, GRAFT_ORACLE_THREADS=os.environ
                         .get("GRAFT_ORACLE_THREADS", "8")))
            wall = round(time.time() - t0 - paused, 1)
            # Trust the exit code (ADVICE r11): this invocation is
            # filtered to the single query q, and selfcheck exits 0
            # only when that query PASSed (a skip-only or empty run
            # exits 1 via the nothing-was-compared guard), so
            # re-grepping the human-readable "PASS n:" summary only
            # added a fragile dependency on the log format.
            status = "PASS" if rc == 0 else "FAIL"
            with lock:
                oracles[q] = {"status": status, "wall": wall, "rc": rc}
                if paused:
                    oracles[q]["disk_guard_paused_sec"] = round(paused, 1)
                save(oracle_path, oracles)
            print(f"[O] {q}: {status} {wall}s"
                  + (f" (+{paused:.0f}s disk-guard pause)" if paused
                     else ""), flush=True)
            pending.remove(q)
            ran = True
        if not ran:
            if not vt.is_alive():
                # verify lane done; anything still undumped is stuck —
                # except skip-verify queries, whose dumps come from an
                # EXTERNAL producer (a batched one-JVM Verify run):
                # keep polling for those.
                missing = [q for q in pending
                           if not dumped(q) and q not in skip_verify]
                if missing:
                    print(f"[O] giving up, no dumps for {missing}",
                          flush=True)
                    return
            time.sleep(20)


vt = threading.Thread(target=verify_lane)
vt.start()
if not walls_only:
    oracle_lane()
vt.join()
npass = sum(1 for v in oracles.values() if v["status"] == "PASS")
print(f"done: oracles {npass}/{len(queries)} PASS; "
      f"walls for {len(walls)} queries", flush=True)
