"""Cheap host-noise probe: per-process pure-register spin throughput.

The benchmark VM's deliverable per-core speed drifts by large factors over
minutes (noisy neighbors). This 6-second probe measures a zero-memory,
zero-syscall integer spin at 1 and 8 concurrent processes; compare against
the machine's known-good values (roughly 58 units/proc at 8 procs) before
trusting any timing run.

Usage: python tools/hostcheck.py  ->  prints JSON {"p1": .., "p8": .., "per8": ..}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _spin(out, i):
    t0 = time.time()
    n = 0
    x = 1
    while time.time() - t0 < 3.0:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) % 2147483648
        n += 1
    out[i] = n / (time.time() - t0)


def probe(procs: int) -> float:
    man = mp.Manager()
    o = man.dict()
    ps = [mp.Process(target=_spin, args=(o, i)) for i in range(procs)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return sum(o.values())


def main():
    p1 = probe(1)
    p8 = probe(8)
    print(json.dumps({"p1": round(p1, 1), "p8": round(p8, 1), "per8": round(p8 / 8, 1)}))


if __name__ == "__main__":
    main()
