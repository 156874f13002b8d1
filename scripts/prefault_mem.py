#!/usr/bin/env python3
"""Pre-fault guest-physical memory after a cold sandbox boot.

Measured live (round 11): this VM restores lazily from a snapshot —
the FIRST touch of any fresh page runs ~0.1 GB/s while re-touch runs
~17 GB/s, so every new JVM heap page, shuffle buffer, and page-cache
fill pays a ~100x fault tax (Spark legs measured 15-19x slower than
the committed records; single-core CPU, sequential direct I/O, and
clocksource all probe healthy, which is what makes this failure mode
hard to spot). Touching all free memory ONCE faults every page at the
hypervisor level; the guest reuses those physical pages at full speed
for the rest of the boot, even across process exits.

Usage: prefault_mem.py [target_gb] [workers]
Defaults: free-8GB headroom, 16 workers (fault handling scales with
concurrent faulting processes).
"""
import multiprocessing as mp
import sys, time


def touch(gb):
    import numpy as np
    held = []
    for _ in range(int(gb)):
        a = np.empty(2**30, dtype=np.uint8)
        a[::4096] = 1
        held.append(a)
    return len(held)


def main():
    free_kb = 0
    for line in open("/proc/meminfo"):
        if line.startswith("MemAvailable"):
            free_kb = int(line.split()[1])
    default_gb = max(0, free_kb // 2**20 - 8)
    gb = int(sys.argv[1]) if len(sys.argv) > 1 else default_gb
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    # Never fault more than requested/available (ADVICE r11): the old
    # per = max(1, gb // workers) floored at 1 GB PER WORKER, so a
    # low-memory box (gb < workers, incl. gb == 0 when MemAvailable
    # < 8 GB) still faulted ~16 GB it didn't have — inviting the OOM
    # killer from the script meant to warm the box up.
    if gb <= 0:
        print("pre-faulted 0 GB (MemAvailable too low — skipping)")
        return
    workers = min(workers, gb)
    per = gb // workers
    t0 = time.time()
    with mp.Pool(workers) as p:
        done = sum(p.map(touch, [per] * workers))
    print(f"pre-faulted {done} GB in {time.time() - t0:.0f}s "
          f"({workers} workers)")


if __name__ == "__main__":
    main()
