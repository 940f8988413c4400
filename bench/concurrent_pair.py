"""Same-window scaling cross-check: the N=2 and 4N=8 executor builds run
CONCURRENTLY on disjoint cores, so both cluster sizes experience the
IDENTICAL host window by construction — the estimator the A-B-A brackets
cannot provide on drifting shared silicon (a healthy bracket certifies the
window was stable across the pair, not that the un-bracketed middle leg
saw the same window as the brackets; see BENCH/BASELINE.md).

Method: launch the 2-executor child pinned to cores 0-2 (2 executors + 1
driver) and, for its whole lifetime, keep an 8-executor child running on
cores 4-12; every 8-exec run that starts AND finishes while the 2-exec
child is alive shares its window. efficiency = median over those inside
runs of docs_per_sec_8 / (4 x docs_per_sec_2).

Bias direction — deliberately conservative: the two engines share the
VM's memory bandwidth, and the 8-executor job draws ~4x the bandwidth of
the 2-executor job, so contention taxes the 8x side harder than the 2x
side. On isolated clusters (or an idle VM) the 8x side would only be
faster, never slower — the printed efficiency is a LOWER estimate of the
isolated value. Core placement keeps 13 of 32 cores busy, inside the
hardware-flat region of the spin calibration (per-core speed flat to ~16
busy cores).

Usage: python bench/concurrent_pair.py [n_docs]   (default 1,600,000)
Env: SAMPLES (default 2). Appends one JSON line per accepted sample to
BENCH/concurrent.jsonl (read by the BASELINE.md report generator).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling import CHILD, REPO, SPIN_GATE, gen_input, probe_per_core  # noqa: E402


def _launch(execs: int, n_docs: int, input_dir: str, cpuset: str):
    code = CHILD.replace("__REPO__", repr(REPO))
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        ["taskset", "-c", cpuset, sys.executable, "-c", code,
         str(execs), str(n_docs), input_dir],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )


def _result(out: str):
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    return None


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    samples = int(os.environ.get("SAMPLES", "2"))
    input_dir = gen_input(n_docs)
    outp = os.path.join(REPO, "BENCH", "concurrent.jsonl")
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    done = 0
    attempts = 0
    while done < samples and attempts < samples * 3:
        attempts += 1
        p = probe_per_core()
        if p < SPIN_GATE:
            print(f"SKIP sample: host degraded (probe {p:.1f} < {SPIN_GATE})")
            time.sleep(20)
            continue
        t0 = time.time()
        p2 = _launch(2, n_docs, input_dir, "0-2")
        runs8: list[dict] = []
        while p2.poll() is None:
            t8s = time.time()
            p8 = _launch(8, n_docs, input_dir, "4-12")
            out8, _ = p8.communicate()
            r8 = _result(out8)
            if r8 is not None:
                runs8.append({"start": round(t8s - t0, 1),
                              "end": round(time.time() - t0, 1), **r8})
        out2, _ = p2.communicate()
        t2_end = time.time() - t0
        r2 = _result(out2)
        if r2 is None:
            print("FAILED sample: 2-exec child produced no RESULT")
            continue
        inside = [r for r in runs8 if r["end"] <= t2_end]
        if not inside:
            print("FAILED sample: no 8-exec run completed inside the 2-exec window")
            continue
        d8 = sorted(r["docs_per_sec"] for r in inside)
        med8 = d8[len(d8) // 2]
        eff = round(med8 / (4 * r2["docs_per_sec"]), 3)
        rec = {
            "n": 2, "n4": 8, "eff": eff, "n_docs": n_docs,
            "start_probe": round(p, 1),
            "build2_sec": r2["build_sec"],
            "builds8_inside_sec": [r["build_sec"] for r in inside],
            "docs_per_sec_2": r2["docs_per_sec"],
            "docs_per_sec_8_median_inside": med8,
            "window_sec": round(t2_end, 1),
        }
        with open(outp, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("CONCURRENT " + json.dumps(rec), flush=True)
        done += 1


if __name__ == "__main__":
    main()
