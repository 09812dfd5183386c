"""~15-second host-speed probe: single-core CPU time and 16-way
memory-bound throughput.  Used to time `bench.py --scaling` runs into the
VM's fast windows (the box swings ±2x with host contention; see
BASELINE.md calibration).  Prints one JSON line:

    {"st_cpu_s": ..., "par16_s": ..., "verdict": "fast"|"slow"}

Reference values measured in a fast window: st_cpu_s ~= 0.95,
par16_s ~= 1.6; in slow windows both inflate 1.5-2.5x.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _cpu_work() -> float:
    t0 = time.perf_counter()
    x = 1
    for i in range(4_000_000):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return time.perf_counter() - t0


def _mem_work(_):
    a = np.random.RandomState(0).randint(0, 1 << 30, 2_000_000)
    for _ in range(6):
        np.sort(a)
    return None


def main():
    st = min(_cpu_work() for _ in range(3))
    t0 = time.perf_counter()
    with mp.Pool(16) as p:
        p.map(_mem_work, range(16))
    par16 = time.perf_counter() - t0
    verdict = "fast" if (st < 1.25 and par16 < 2.6) else "slow"
    print(json.dumps({"st_cpu_s": round(st, 3),
                      "par16_s": round(par16, 3),
                      "verdict": verdict}))


if __name__ == "__main__":
    main()
