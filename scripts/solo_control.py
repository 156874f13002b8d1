#!/usr/bin/env python3
"""Live negative control for Bench's solo self-healing (VERDICT r9
#1 done-gate): prove that a deliberately-loaded bench run produces an
artifact whose "solo" map matches idle values within noise.

Protocol (two Bench runs over the same small query subset):
  1. IDLE reference: Bench with SPARK_GRAFT_ONLY=<subset> on the
     unloaded box -> idle.json.
  2. LOADED run: start a CPU load generator (default 48 spinner
     processes on the 32-core box), run Bench with the same subset
     plus SPARK_GRAFT_FORCE_SOLO=<subset> and
     SPARK_GRAFT_PHASE_MARKER=<file>; a watcher thread kills the load
     the moment the marker appears (corpus phase over), so the solo
     re-measure that follows runs on a released box -> loaded.json.

Asserts:
  a. the load actually bit: loaded corpus total >= MIN_BITE x idle
     total (otherwise the control proves nothing -- rerun);
  b. every solo value is within SOLO_TOL of its idle value and the
     solo median ratio is within MED_TOL (the healed numbers ARE the
     idle numbers);
  c. the solo bracket probes are clean (< 2x warm floor);
  d. bench_diff.py idle.json loaded.json exits 0 via the healed path
     (not 3), i.e. the round's record is usable end-to-end.

Exit 0 = control passed; 1 = healing failed (solo drifted / bracket
dirty / bench_diff still inconclusive); 2 = control inconclusive
(load did not bite -- box already contended or spinners starved).

Usage: solo_control.py [--queries q_a,q_b,...] [--spinners N]
Takes ~6-10 min (two sbt-launched Bench runs).
"""
import argparse, json, os, signal, subprocess, sys, threading, time

WARM_FLOOR = 0.18       # lockstep with Bench.WarmFloor / bench_diff.py
MIN_BITE = 1.25         # loaded corpus must be >= this x idle total
SOLO_TOL = 1.35         # per-query solo vs idle ceiling
MED_TOL = 1.20          # median solo/idle ratio ceiling

DEFAULT_QUERIES = ("q_graph_triangles,q_k_core,q_ann_pq,"
                   "q_link_prediction,q_agg_heavy_hitters_cms")

def run_bench(out, only, extra_env):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=os.environ.get(
                   "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
               SPARK_GRAFT_ONLY=only,
               SPARK_GRAFT_BENCH_OUT=out, **extra_env)
    p = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=env, cwd=os.path.dirname(
                           os.path.dirname(os.path.abspath(__file__))),
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    tail = p.stdout.decode(errors="replace")[-3000:]
    if not os.path.exists(out):
        print(tail)
        sys.exit(f"bench run produced no artifact at {out}")
    return json.load(open(out))

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=DEFAULT_QUERIES)
    ap.add_argument("--spinners", type=int, default=48)
    ap.add_argument("--save-fixture", metavar="DIR",
                    help="on PASS, copy the captured pair into DIR as "
                         "idle.json / tripped_healed.json — the "
                         "committed regression input for bench_diff's "
                         "prefer-solo branch (VERDICT r10 #5)")
    a = ap.parse_args()
    qs = a.queries
    marker = f"/tmp/solo_control_marker_{os.getpid()}"
    idle_out = f"/tmp/solo_control_idle_{os.getpid()}.json"
    load_out = f"/tmp/solo_control_loaded_{os.getpid()}.json"
    if os.path.exists(marker):
        os.unlink(marker)

    print(f"[1/2] idle reference over {qs} ...")
    idle = run_bench(idle_out, qs, {})
    it = sum(idle["queries"].values())
    print(f"      idle total {it:.1f}s, probes "
          f"{idle['calibration']['pre']:.3f}/"
          f"{idle['calibration']['post']:.3f}s")
    if max(idle["calibration"]["pre"],
           idle["calibration"]["post"]) >= 2 * WARM_FLOOR:
        print("INCONCLUSIVE: the 'idle' reference itself ran contended "
              "— rerun on a quiet box")
        sys.exit(2)

    print(f"[2/2] loaded run: {a.spinners} spinners until corpus-done "
          "marker ...")
    spinners = [subprocess.Popen(
        [sys.executable, "-c", "while True:\n pass"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for _ in range(a.spinners)]
    released_at = {}

    def watcher():
        while not os.path.exists(marker):
            if any(s.poll() is None for s in spinners):
                time.sleep(0.3)
            else:
                return  # all spinners died externally
        for s in spinners:
            try: s.send_signal(signal.SIGKILL)
            except OSError: pass
        released_at["t"] = time.time()
        print("      marker seen — load released before solo phase")

    w = threading.Thread(target=watcher, daemon=True)
    w.start()
    try:
        loaded = run_bench(load_out, qs, {
            "SPARK_GRAFT_FORCE_SOLO": qs,
            "SPARK_GRAFT_PHASE_MARKER": marker,
            "SPARK_GRAFT_BENCH_PREV": idle_out})
    finally:
        for s in spinners:
            try: s.send_signal(signal.SIGKILL)
            except OSError: pass
    lt = sum(loaded["queries"].values())
    print(f"      loaded corpus total {lt:.1f}s ({lt/it:.2f}x idle), "
          f"probes {loaded['calibration']['pre']:.3f}/"
          f"{loaded['calibration']['post']:.3f}s")

    if lt < MIN_BITE * it:
        print(f"INCONCLUSIVE: load did not bite (corpus only "
              f"{lt/it:.2f}x idle, need >= {MIN_BITE}) — spinners "
              "starved or box state unusual; control proves nothing")
        sys.exit(2)
    if "t" not in released_at:
        print("INCONCLUSIVE: phase marker never appeared — load was "
              "never released, solo phase ran loaded")
        sys.exit(2)

    solo = loaded.get("solo") or {}
    scal = loaded.get("solo_cal") or {}
    ok = True
    if set(solo) != set(idle["queries"]):
        print(f"FAIL: solo map {sorted(solo)} != subset "
              f"{sorted(idle['queries'])}")
        ok = False
    if not scal or max(scal.get("pre", 99), scal.get("post", 99)) \
            >= 2 * WARM_FLOOR:
        print(f"FAIL: solo bracket not clean: {scal} (load release "
              "too late, or box still contended)")
        ok = False
    ratios = sorted(solo[q] / idle["queries"][q] for q in solo
                    if q in idle["queries"])
    for q in sorted(solo):
        if q in idle["queries"]:
            r = solo[q] / idle["queries"][q]
            flag = "" if r <= SOLO_TOL else "  <-- DRIFTED"
            print(f"      solo {q}: {idle['queries'][q]:.2f}s idle -> "
                  f"{solo[q]:.2f}s solo ({r:.2f}x){flag}")
            if r > SOLO_TOL:
                ok = False
    if ratios and ratios[len(ratios) // 2] > MED_TOL:
        print(f"FAIL: median solo/idle ratio "
              f"{ratios[len(ratios)//2]:.2f} > {MED_TOL}")
        ok = False

    diff = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_diff.py"), idle_out, load_out],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    print(diff.stdout.decode(errors="replace"))
    # NOTE: with a <=5-query subset the probe detector is what trips
    # (median needs >=20 queries); bench_diff must land on the healed
    # exit-0 path, not the blanket inconclusive 3
    if diff.returncode != 0:
        print(f"FAIL: bench_diff exited {diff.returncode}, expected 0 "
              "via the solo-healed path")
        ok = False

    print("CONTROL " + ("PASSED: contended corpus, clean healed solo "
                        "map, bench_diff reads it as numbers of record"
                        if ok else "FAILED"))
    if ok and a.save_fixture:
        # a PASSED control's pair IS the healed-path regression input:
        # idle prev with clean probes, tripped curr with a clean solo
        # map that bench_diff must read as numbers of record
        import shutil
        os.makedirs(a.save_fixture, exist_ok=True)
        shutil.copy(idle_out, os.path.join(a.save_fixture, "idle.json"))
        shutil.copy(load_out,
                    os.path.join(a.save_fixture, "tripped_healed.json"))
        print(f"fixture pair written to {a.save_fixture}/")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
