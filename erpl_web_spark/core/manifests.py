"""Manifest-file commit protocol for versioned parquet state dirs.

The incremental state kept by this engine (CDC snapshots ``path/v=N``,
lexical/semantic dedup index deltas ``path/batch=N``, the semantic
index's coarse quantizer ``path/centroids``) is plain parquet on any
Hadoop-visible filesystem. Parquet's own ``_SUCCESS`` marker commits a
SINGLE directory, but readers still had to *list data directories* to
discover versions — a torn multi-file write (data files present,
``_SUCCESS`` pending) or an eventually-consistent object-store listing
could surface a half-written version. This module makes commits
explicit and readers listing-safe:

- a version is COMMITTED iff ``<path>/_manifests/<kind>-<N>.json``
  exists; the manifest is written strictly AFTER the data write
  returns, via create-temp + close + rename (atomic on HDFS/local;
  on object stores the rename of a one-block file is the standard
  manifest idiom — the visible object appears whole or not at all);
- readers enumerate ``_manifests/`` ONLY and read exactly the data
  directories the manifests name — a data dir without its manifest is
  invisible, no matter what a raw listing returns;
- deletes remove the manifest FIRST, then the data — readers can race
  a cleanup and at worst re-read a still-complete version, never a
  half-deleted one.

All filesystem access goes through the Hadoop FileSystem API of the
active session (``Path.getFileSystem``), so ``path`` may be a local
dir, HDFS, or any object store with a configured connector — unlike
the ``os.listdir`` readers this replaces, which silently required a
driver-local path.

Reference anchor: the reference keeps connector state in DuckDB tables
(transactional for free, e.g. ODP subscription state,
odp_subscription.cpp); parquet-on-DFS state needs this explicit commit
protocol instead.
"""

from __future__ import annotations

import json

_MANIFEST_DIR = "_manifests"


def _fs(spark, path_str: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(hconf), jvm, path


def commit_version(spark, path: str, kind: str, n: int, payload: dict | None = None) -> None:
    """Publish version ``n`` of ``kind`` under ``path`` — call only
    after the data write has fully returned. Idempotent: a replayed
    batch rewrites the same manifest content."""
    fs, jvm, _ = _fs(spark, path)
    mdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}")
    fs.mkdirs(mdir)
    body = dict(payload or {})
    body.setdefault("kind", kind)
    body.setdefault("version", n)
    data = json.dumps(body, sort_keys=True).encode()
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}/.tmp-{kind}-{n}.json")
    final = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}/{kind}-{n}.json")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    # rename-over: delete a stale target from a previous replay first
    # (HDFS rename refuses to clobber); the gap is harmless — the
    # replayed manifest carries identical content.
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"manifest rename failed: {tmp} -> {final}")


def committed_versions(spark, path: str, kind: str, before: int | None = None) -> list[int]:
    """Sorted committed version numbers of ``kind`` under ``path``
    (empty when none) — reads the manifest listing ONLY."""
    fs, jvm, _ = _fs(spark, path)
    mdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    prefix = f"{kind}-"
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if not (name.startswith(prefix) and name.endswith(".json")):
            continue
        try:
            out.append(int(name[len(prefix):-len(".json")]))
        except ValueError:
            continue
    out.sort()
    return [n for n in out if before is None or n < before]


def retract_version(spark, path: str, kind: str, n: int, data_subdir: str) -> None:
    """Delete one committed version: manifest first (readers stop seeing
    it), then the data directory."""
    fs, jvm, _ = _fs(spark, path)
    manifest = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}/{kind}-{n}.json")
    if fs.exists(manifest):
        fs.delete(manifest, False)
    data = jvm.org.apache.hadoop.fs.Path(f"{path}/{data_subdir}")
    if fs.exists(data):
        fs.delete(data, True)
