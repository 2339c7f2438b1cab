#!/usr/bin/env python
"""Pinned pure-CPU host probe — the gate for scaling-pair validity.

Measures per-core arithmetic throughput (register-only splitmix64 loop, no
memory traffic) at several pinned core counts. On a fair host, per-core
units are flat in the core count; on this sandbox the hypervisor sometimes
throttles sustained multi-core load, which corrupts any N-vs-4N pair run in
that window (BENCH.md round-2 log: rejected pairs in both directions).

Protocol: run the probe IMMEDIATELY BEFORE a scaling pair. Accept the pair
only if the probe's 16-core per-core ratio vs 4-core is >= the threshold
(default 0.90). Prints one JSON line.

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


def probe(cores: int, secs: float) -> float:
    """Mean per-core loop units across ``cores`` pinned workers."""
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_spin, args=(c, secs, q)) for c in range(cores)]
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
    healthy = rel[16] >= 0.90
    print(json.dumps({
        "metric": "pinned pure-CPU per-core units",
        "secs_per_level": secs,
        "units_per_core": units,
        "relative_to_4": rel,
        "healthy_for_4_16_pair": healthy,
    }))


if __name__ == "__main__":
    main()
