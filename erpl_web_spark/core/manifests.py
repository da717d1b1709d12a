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
- deletes remove the manifest FIRST, then the data — a reader that
  races a cleanup either skips the version (``data_dirs`` treats a
  vanished manifest as no-longer-committed after a brief re-check) or
  fails loudly on the deleted directory; it never silently reads a
  half-deleted or pre-redirect state.

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
    if fs.exists(final):
        # Replacing a live manifest (batch replay, compaction redirect)
        # must not expose a missing-manifest window to a racing reader:
        # prefer FileContext's atomic overwrite rename. Where the
        # filesystem doesn't support it, fall back to delete-then-rename
        # — the ``data_dirs`` re-check loop absorbs that gap.
        try:
            fctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                fs.getUri(), spark._jsc.hadoopConfiguration()
            )
            ren = jvm.org.apache.hadoop.fs.Options.Rename
            opts = spark._sc._gateway.new_array(ren, 1)
            opts[0] = ren.OVERWRITE
            fctx.rename(tmp, final, opts)
            return
        except Exception:
            if not fs.exists(tmp) and fs.exists(final):
                return  # the overwrite rename did land before the error
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


def uncommit_version(spark, path: str, kind: str, n: int) -> None:
    """Remove ONLY the manifest of a version, leaving its data in
    place. Writers call this before overwriting a version's data
    directory on batch replay: between the previous attempt's commit
    and the rewrite, readers must not resolve the version to a
    directory that is about to be (or is being) clobbered.

    Also creates ``_manifests/`` if absent — the directory doubles as
    the protocol marker that lets readers tell OUR torn first write
    (data + _SUCCESS, manifest pending: invisible, by design) apart
    from pre-manifest legacy state (no ``_manifests`` at all: raise and
    ask for adoption)."""
    fs, jvm, _ = _fs(spark, path)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}"))
    manifest = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}/{kind}-{n}.json")
    if fs.exists(manifest):
        fs.delete(manifest, False)


def manifest_payload(spark, path: str, kind: str, n: int) -> dict:
    """The committed manifest's JSON body (empty dict when absent)."""
    payload = _manifest_payload(spark, path, kind, n)
    return {} if payload is None else payload


def _manifest_payload(spark, path: str, kind: str, n: int) -> dict | None:
    """Manifest body, or ``None`` when the manifest file is ABSENT —
    the distinction ``data_dirs`` needs to tell a retracted version
    apart from one with an empty payload. Raises on a present but
    unparseable manifest (protocol violation: renamed manifests are
    whole-file-visible and immutable)."""
    fs, jvm, _ = _fs(spark, path)
    manifest = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}/{kind}-{n}.json")
    if not fs.exists(manifest):
        return None
    try:
        stream = fs.open(manifest)
    except Exception:
        if not fs.exists(manifest):
            return None  # retracted between the exists probe and the open
        raise
    try:
        # commons-io ships with Spark; py4j passes Java byte[] back as
        # Python bytes (a Python-side read loop can't work — py4j byte[]
        # arguments are pass-by-value, mutations don't propagate)
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    try:
        return json.loads(data.decode())
    except ValueError:
        raise IOError(f"unparseable manifest: {path}/{_MANIFEST_DIR}/{kind}-{n}.json")


def data_dirs(spark, path: str, kind: str, before: int | None = None) -> list[str]:
    """Full paths of the committed data directories, version-ordered.
    A manifest may point at a non-default directory via its ``data``
    payload key (compaction commits do); otherwise ``<kind>=<n>``.

    A manifest that vanishes between the ``committed_versions`` listing
    and the payload read is NOT resolved to the default directory (the
    version may have been retracted — its data directory is being
    deleted — or a fallback delete-then-rename replace is mid-swap and
    the default dir holds pre-redirect content). Instead the read is
    retried briefly (a replace lands within milliseconds) and the
    version is treated as no-longer-committed if the manifest stays
    gone. The confirm re-listing is cached per call (one extra
    ``_manifests/`` listing no matter how many versions miss — a racing
    cleanup retracting many versions at once must not cost O(versions)
    directory listings), with one fresh listing taken on the would-fail
    path so a version retracted after the cache was taken is skipped
    rather than reported as unreadable; the fresh listing replaces the
    cached set, so later versions of the same mass-retraction reuse it
    instead of re-listing."""
    import time

    out = []
    recheck: set[int] | None = None  # lazily-taken confirm listing
    for n in committed_versions(spark, path, kind, before=before):
        payload = _manifest_payload(spark, path, kind, n)
        for _ in range(4):
            if payload is not None:
                break
            time.sleep(0.05)
            payload = _manifest_payload(spark, path, kind, n)
        if payload is None:
            if recheck is None:
                recheck = set(committed_versions(spark, path, kind))
            if n in recheck:
                # still listed as committed after the retry window — a
                # replace may have landed just now, so give the payload
                # ONE post-listing read before failing; if it is still
                # unreadable, fail loudly: silently dropping a committed
                # version would return an incomplete union (an index
                # missing a whole delta admits duplicates with no error)
                payload = _manifest_payload(spark, path, kind, n)
                if payload is None:
                    # the cached confirm listing may predate a racing
                    # retraction of THIS version — take one fresh
                    # listing before failing so a genuinely-retracted
                    # version is skipped, not mis-reported. The fresh
                    # listing REPLACES the cached confirm set: a
                    # cleanup retracting many versions at once then
                    # costs one listing total, not one per retracted
                    # version (the O(1)-listings contract above).
                    recheck = set(committed_versions(spark, path, kind))
                    if n not in recheck:
                        continue
                    raise IOError(
                        f"committed manifest unreadable: {path}/{_MANIFEST_DIR}/"
                        f"{kind}-{n}.json"
                    )
            else:
                continue  # retracted after the listing
        sub = payload.get("data") or f"{kind}={n}"
        out.append(f"{path}/{sub}")
    return out


def read_committed_union(spark, path: str, kind: str, before: int | None = None):
    """Union DataFrame over every committed version's data (resolving
    compaction redirects), or None when nothing is committed. Raises on
    pre-manifest legacy state instead of silently reading nothing —
    see ``adopt_success_markers``."""
    dirs = data_dirs(spark, path, kind, before=before)
    if not dirs:
        assert_no_legacy_state(spark, path, kind)
        return None
    return spark.read.parquet(*dirs)


def _legacy_versions(spark, path: str, kind: str, ignore_marker: bool = False) -> list[int]:
    """Version numbers of pre-manifest state: ``<kind>=<n>`` data dirs
    carrying a parquet ``_SUCCESS`` marker but no manifest — and no
    ``_manifests`` directory either. Once ``_manifests`` exists the
    path is protocol-managed, and an unmanifested data dir is a torn
    write (invisible by design), not legacy state. ``ignore_marker``
    lets adoption resume after a partially-completed earlier run
    (which already created ``_manifests``)."""
    fs, jvm, root = _fs(spark, path)
    if not fs.exists(root):
        return []
    if not ignore_marker and fs.exists(
        jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}")
    ):
        return []
    committed = set(committed_versions(spark, path, kind))
    prefix = f"{kind}="
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        try:
            n = int(name[len(prefix):])
        except ValueError:
            continue
        if n in committed:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/{name}/_SUCCESS")):
            out.append(n)
    out.sort()
    return out


def assert_no_legacy_state(spark, path: str, kind: str) -> None:
    """Fail loudly when a state directory holds _SUCCESS-committed
    versions from before the manifest protocol: treating them as
    absent would silently rebuild state from scratch (CDC snapshots
    would merge against an empty base; a semantic index would derive a
    SECOND quantizer inconsistent with every existing delta)."""
    legacy = _legacy_versions(spark, path, kind)
    if legacy:
        raise RuntimeError(
            f"{path} holds pre-manifest state versions {legacy} "
            f"(kind={kind!r}: _SUCCESS present, manifest missing). Run "
            "erpl_web_spark.core.manifests.adopt_success_markers(spark, "
            f"path, {kind!r}) once to commit manifests for them."
        )


def compact_versions(
    spark,
    path: str,
    kind: str,
    keep_latest: int = 1,
    merge=None,
    extra_payload: dict | None = None,
) -> int:
    """Merge old committed versions of ``kind`` into one directory to
    keep the read-side file count bounded as versions accumulate —
    generic over any state whose reader unions whole rows (the three
    dedup indexes all qualify).

    ``merge`` overrides the default full-row ``dropDuplicates`` with a
    semantic combinator (DataFrame -> DataFrame) — ONLY valid when the
    reader's aggregation is IDEMPOTENT under row duplication, because
    the crash-recovery contract makes merged-away rows visible TWICE
    until the retractions complete: the HLL index qualifies (register
    max is unchanged by doubled rows; pre-MAXing also shrinks), but
    ADDITIVE state does NOT — doubling (d, w, cnt) rows doubles a
    Count-Min sum, so the cms index must never be compacted with this
    machinery (its per-batch row count is bounded at depth x width,
    so accumulation is harmless; see operators/cms_index.py).
    ``extra_payload`` keys are merged into the redirect manifest (the
    sketch indexes carry their geometry there).

    All committed versions EXCEPT the ``keep_latest`` newest are
    unioned (full-row ``dropDuplicates``) and rewritten into a new
    generation directory; the OLDEST surviving version's manifest is
    re-pointed at it (one atomic manifest replace) and only then are
    the merged-away versions retracted. Version ids never move
    FORWARD, so a replay guard of the form "batch N reads versions
    strictly below N" still sees exactly the same rows (the newest —
    only replayable — version is never merged when
    ``keep_latest >= 1``). Crash-safe by redirection, never by
    deletion order: the worst case (die between the redirect commit
    and the retractions) shows merged-away rows TWICE until the next
    compaction, which the full-row dedup makes self-healing. Returns
    the number of directories merged (0 when nothing to do).

    ``keep_latest`` must be >= 1: merging the NEWEST version would let
    a crashed-then-replayed batch N see its own rows through the merged
    generation (every keeper would self-match as ``dup_of_index`` and
    the rewritten delta would come back empty) — the replay invariant
    only holds while the one replayable version is never merged.
    """
    if keep_latest < 1:
        raise ValueError(
            "keep_latest must be >= 1: the newest (only replayable) "
            "version must never be merged"
        )
    parts = committed_versions(spark, path, kind)
    to_merge = parts[: max(0, len(parts) - keep_latest)]
    if len(to_merge) < 2:
        return 0
    target = to_merge[0]
    old_dirs = data_dirs(spark, path, kind, before=to_merge[-1] + 1)
    if len(old_dirs) != len(to_merge):
        # the protocol is single-writer: a listing that disagrees with
        # the versions we just resolved means another process retracted
        # or committed concurrently. Truncating would misalign
        # zip(to_merge, old_dirs) and retract a LIVE directory under a
        # different version — fail loudly instead.
        raise RuntimeError(
            f"concurrent writer detected during compaction of {path} "
            f"({kind}): resolved {len(old_dirs)} data dirs for "
            f"{len(to_merge)} versions {to_merge}"
        )
    # generation suffix from the newest merged id: never collides with
    # a LATER compaction's directory; if a previous partial run already
    # committed this generation, alternate the suffix so the write
    # never overwrites the directory the live manifest points at
    gen_dir = f"{kind}={target}.c{to_merge[-1]}"
    current = manifest_payload(spark, path, kind, target).get("data")
    if current == gen_dir:
        gen_dir += "b"
    union = spark.read.parquet(*old_dirs)
    merged = merge(union) if merge is not None else union.dropDuplicates()
    merged.write.mode("overwrite").parquet(f"{path}/{gen_dir}")
    # atomic switch: target now resolves to the merged generation
    payload = {"data": gen_dir}
    if extra_payload:
        payload.update(extra_payload)
    commit_version(spark, path, kind, target, payload)
    fs, jvm, _ = _fs(spark, path)
    for n, d in zip(to_merge, old_dirs):
        if n == target:
            # retract only the stale data dir (manifest was re-pointed)
            stale = jvm.org.apache.hadoop.fs.Path(d)
            if d != f"{path}/{gen_dir}" and fs.exists(stale):
                fs.delete(stale, True)
        else:
            retract_version(spark, path, kind, n, d[len(path) + 1:])
    return len(to_merge)


def adopt_success_markers(spark, path: str, kind: str) -> list[int]:
    """One-time migration: commit a manifest for every pre-manifest
    ``<kind>=<n>`` directory whose parquet ``_SUCCESS`` marker shows a
    complete write. Returns the adopted version numbers. Safe to re-run
    (a crashed adoption resumes where it stopped)."""
    legacy = _legacy_versions(spark, path, kind, ignore_marker=True)
    for n in legacy:
        commit_version(spark, path, kind, n, {"adopted_from": "_SUCCESS"})
    return legacy
