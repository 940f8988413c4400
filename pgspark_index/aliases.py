"""Index aliases: versioned index directories + atomic cutover.

Reference analog: pgstream names search-store indices ``<schema>-<version>``
and reads/writes through an alias that is repointed on reindex
(/root/reference/pkg/wal/processor/search/store/search_index_name.go:29-66):
readers never see a half-built index, and the previous version stays
intact for rollback until explicitly removed.

Layout under a base dir:
  <base>/<name>-v<N>/        — one full index per version (segments, docs,
                               lexicon, manifest, stats.json)
  <base>/aliases.json        — {alias: "<name>-v<N>"}; the ONLY mutable
                               pointer, swapped atomically (tmp + rename)

Usage:
  v2 = aliases.new_version(base, "webtext")          # next version dir
  build.build_index(spark, src, v2); merge.merge_index(spark, v2)
  aliases.publish(base, "webtext", v2)               # atomic cutover
  idx = aliases.resolve(base, "webtext")             # query-side lookup
  query.search(spark, idx, terms, k)
"""

from __future__ import annotations

import json
import os
import re
import shutil


def _aliases_file(base_dir: str) -> str:
    return os.path.join(base_dir, "aliases.json")


def read_aliases(base_dir: str) -> dict[str, str]:
    try:
        with open(_aliases_file(base_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def versions(base_dir: str, name: str) -> list[int]:
    """Existing version numbers for ``name`` (sorted ascending)."""
    pat = re.compile(re.escape(name) + r"-v(\d+)$")
    out = []
    if os.path.isdir(base_dir):
        for d in os.listdir(base_dir):
            m = pat.match(d)
            if m and os.path.isdir(os.path.join(base_dir, d)):
                out.append(int(m.group(1)))
    return sorted(out)

def new_version(base_dir: str, name: str) -> str:
    """Next version's directory path (created). Building into it does NOT
    affect readers — only ``publish`` repoints the alias."""
    n = (versions(base_dir, name) or [0])[-1] + 1
    d = os.path.join(base_dir, f"{name}-v{n}")
    os.makedirs(d, exist_ok=True)
    return d


def publish(base_dir: str, name: str, version_dir: str) -> None:
    """Atomically repoint alias ``name`` at ``version_dir`` (tmp + rename —
    a crash leaves either the old or the new alias file, never a torn
    one). The index must be complete (stats.json present)."""
    vd = os.path.basename(os.path.normpath(version_dir))
    if not os.path.exists(os.path.join(base_dir, vd, "stats.json")):
        raise ValueError(
            f"refusing to publish incomplete index {vd!r} (no stats.json — "
            "run merge_index first)"
        )
    aliases = read_aliases(base_dir)
    aliases[name] = vd
    tmp = _aliases_file(base_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(aliases, f)
    os.replace(tmp, _aliases_file(base_dir))


def resolve(base_dir: str, name: str) -> str:
    """Alias -> current index dir (the query layer's entry point)."""
    aliases = read_aliases(base_dir)
    if name not in aliases:
        raise KeyError(f"no alias {name!r} in {base_dir} (have {sorted(aliases)})")
    return os.path.join(base_dir, aliases[name])


def drop_version(base_dir: str, name: str, version: int) -> None:
    """Remove an old version's directory. Refuses to drop the version the
    alias currently points at."""
    vd = f"{name}-v{version}"
    if read_aliases(base_dir).get(name) == vd:
        raise ValueError(f"{vd} is the live alias target — publish another first")
    shutil.rmtree(os.path.join(base_dir, vd))
