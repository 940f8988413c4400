"""Per-operation metrics export — the engine's otel analog.

The reference instruments every component and exports counters/latencies
through OpenTelemetry (/root/reference/pkg/otel/otel_instrumentation.go,
/root/reference/pkg/otel/otel_provider.go). The batch-engine re-expression:
every mutating verb (build / delta / compact / merge-units /
retry-quarantined / merge) appends one JSON record under
``<index>/metrics/`` — rows in/out, quarantined/dropped counts, phase
wall-times — and refreshes ``<index>/metrics.json`` with the latest
record, so operators (and the bench harness) can attribute time and data
loss per stage without re-deriving it from Spark UI state.

Driver-side, single-writer, atomic (tmp+rename) — same discipline as the
manifest.
"""

from __future__ import annotations

import glob
import json
import os
import time


def metrics_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "metrics")


def write_metrics(index_dir: str, verb: str, payload: dict) -> str:
    """Append one metrics record; returns the record path."""
    d = metrics_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    rec = {
        "verb": verb,
        "unix_ts": round(time.time(), 3),
        **{k: v for k, v in payload.items() if _jsonable(v)},
    }
    seq = len(glob.glob(os.path.join(d, "*.json")))
    final = os.path.join(d, f"{seq:06d}-{verb}.json")
    blob = json.dumps(rec, default=str)
    for path in (final, os.path.join(index_dir, "metrics.json")):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(blob)
        os.replace(tmp, path)
    return final


def _jsonable(v) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False


def read_metrics(index_dir: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(metrics_dir(index_dir), "*.json"))):
        try:
            with open(p) as f:
                out.append(json.load(f))
        except (OSError, ValueError):
            continue
    return out
