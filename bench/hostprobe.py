#!/usr/bin/env python
"""Pinned host probe — the gate for scaling-pair validity. Two axes:

- **cpu**: per-core arithmetic throughput (register-only splitmix64 loop,
  no memory traffic) at several pinned core counts. Catches hypervisor
  CPU throttling of sustained multi-core load.
- **mem**: per-core STREAMING-memory throughput (in-place 64 MB numpy
  multiply — larger than any cache level, so it measures the shared
  memory path). Catches the second host failure mode this sandbox
  exhibits: windows where pure-CPU scales fine but memory bandwidth
  beyond ~4 cores collapses (observed 2026-08-20: cpu 16c/4c = 1.06
  while mem 16c/4c = 0.63 in the same minute — and the index build,
  whose shuffle/codec phases stream far more bytes than they compute,
  tracked the MEM axis: 16-core level 25% slower than the accepted-pair
  window on byte-identical code).

On a fair host, per-core units are flat in the core count on BOTH axes;
separate cluster nodes share neither resource, so a window where either
axis degrades 4->16 cannot measure the N->4N analogue faithfully.

Protocol: run the probe IMMEDIATELY BEFORE a scaling pair. Accept the
pair only if BOTH 16-core per-core ratios vs 4-core clear their
thresholds (cpu >= 0.90; mem >= 0.80 — real DDR saturation costs a few
percent at 16 streams, the failure mode costs tens). Prints one JSON
line.

Usage: python bench/hostprobe.py [seconds_per_level]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

LEVELS = [4, 16, 32]


def _spin(core: int, secs: float, out) -> None:
    os.sched_setaffinity(0, {core})
    x = 0x9E3779B97F4A7C15
    n = 0
    t_end = time.time() + secs
    while time.time() < t_end:
        for _ in range(100_000):
            x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
            x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        n += 1
    out.put(n)


def _stream(core: int, secs: float, out) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np
    a = np.ones(1 << 23, dtype=np.float64)   # 64 MB source
    b = np.empty_like(a)                     # 64 MB sink, allocated once
    n = 0
    t_end = time.time() + secs
    while time.time() < t_end:
        np.multiply(a, 1.0000001, out=b)
        n += 1
    out.put(n)


def probe(cores: int, secs: float, fn=_spin) -> float:
    """Mean per-core units across ``cores`` pinned workers."""
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=fn, args=(c, secs, q)) for c in range(cores)]
    for p in ps:
        p.start()
    got = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(got) / len(got)


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    units = {c: round(probe(c, secs), 1) for c in LEVELS}
    base = units[LEVELS[0]]
    rel = {c: round(units[c] / base, 3) for c in LEVELS}
    mem_units = {c: round(probe(c, secs, _stream), 1) for c in LEVELS}
    mem_base = mem_units[LEVELS[0]]
    mem_rel = {c: round(mem_units[c] / mem_base, 3) for c in LEVELS}
    # a strongly SUPERLINEAR per-core ratio is as disqualifying as a
    # degraded one: it means the 4-core baseline itself was suppressed
    # while it ran (observed: mem 4c units collapsing 15x mid-probe), so
    # nothing measured in that window can be trusted either way
    healthy = (0.90 <= rel[16] <= 1.25) and (0.80 <= mem_rel[16] <= 1.35)
    print(json.dumps({
        "metric": "pinned per-core units (cpu: register loop; "
                  "mem: 64MB streaming multiply)",
        "secs_per_level": secs,
        "units_per_core": units,
        "relative_to_4": rel,
        "mem_units_per_core": mem_units,
        "mem_relative_to_4": mem_rel,
        "healthy_for_4_16_pair": healthy,
    }))


if __name__ == "__main__":
    main()
