"""Pointer-file version commits — the object-store-safe replacement for
directory-swap promotion.

Layout under a table root::

    root/
      _current            <- pointer file: relative path of the live data dir
      _buffer_<name>      <- pointer file per named secondary buffer
      _versions/v-<hex>/  <- immutable data directories (parquet)
      current/            <- legacy layout (pre-pointer), adopted on first use

Commit protocol: write the new pointer content to a temp file, then
``os.replace()`` it onto the pointer name — atomic on POSIX filesystems.
On an object store the analogue is a single small PUT of the pointer
object, which is atomic per-object: a reader sees either the old or the
new pointer, never a partial state. Data directories are NEVER moved or
deleted by a commit, so a reader that resolved the old pointer keeps
reading a fully intact directory; retired versions are removed later by
``vacuum()`` once unreferenced.

Reference behavior matched: promote-by-alias-repoint — the reference
promotes a secondary ES buffer by atomically moving the read alias, not
by copying indexes (ElasticsearchIndexService.java:495-545); the pointer
file is the filesystem rendering of that alias.

The leading ``_`` on pointer files and the versions directory keeps them
invisible to Hadoop/Spark directory listings (same convention as
``_SUCCESS``), so a legacy reader pointed at ``root`` never sees them as
data.
"""

from __future__ import annotations

import os
import shutil
import uuid

CURRENT = "_current"
VERSIONS_DIR = "_versions"


def buffer_pointer(name: str) -> str:
    return f"_buffer_{name}"


def new_version() -> str:
    """Relative path of a fresh, never-used data directory."""
    return os.path.join(VERSIONS_DIR, "v-" + uuid.uuid4().hex[:12])


def read_pointer(root: str, pointer: str = CURRENT) -> str | None:
    """Current pointer content (relative dir path), or None if absent."""
    try:
        with open(os.path.join(root, pointer)) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


def commit(root: str, version: str, pointer: str = CURRENT) -> None:
    """Atomically repoint ``pointer`` at ``version`` (a root-relative dir).

    write-temp + rename: readers racing the commit resolve either the old
    or the new version, both of which are intact directories.
    """
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".{pointer}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(root, pointer))


def drop_pointer(root: str, pointer: str) -> None:
    try:
        os.remove(os.path.join(root, pointer))
    except FileNotFoundError:
        pass


def resolve(root: str, pointer: str = CURRENT, legacy: str | None = None) -> str | None:
    """Absolute path of the directory ``pointer`` names; falls back to the
    ``legacy`` (pre-pointer) directory name if the pointer is absent and
    that directory exists. None if neither exists."""
    v = read_pointer(root, pointer)
    if v is not None:
        return os.path.join(root, v)
    if legacy is not None and os.path.isdir(os.path.join(root, legacy)):
        return os.path.join(root, legacy)
    return None


def referenced(root: str) -> set[str]:
    """All root-relative dirs any pointer currently references."""
    out: set[str] = set()
    if not os.path.isdir(root):
        return out
    for name in os.listdir(root):
        if name == CURRENT or name.startswith("_buffer_"):
            v = read_pointer(root, name)
            if v:
                out.add(v)
    return out


def vacuum(root: str, keep: int = 1) -> list[str]:
    """Delete version directories no pointer references, keeping the
    ``keep`` most-recently-modified unreferenced ones as a grace window for
    in-flight readers (a production deployment uses an age-based grace,
    e.g. "retired > 7 days"; mtime-ranked count is the test-friendly
    equivalent). Returns the root-relative dirs removed."""
    vdir = os.path.join(root, VERSIONS_DIR)
    if not os.path.isdir(vdir):
        return []
    live = referenced(root)
    candidates = [
        os.path.join(VERSIONS_DIR, d)
        for d in os.listdir(vdir)
        if os.path.join(VERSIONS_DIR, d) not in live
    ]
    candidates.sort(key=lambda rel: os.path.getmtime(os.path.join(root, rel)), reverse=True)
    removed = []
    for rel in candidates[keep:]:
        shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
        removed.append(rel)
    return removed
