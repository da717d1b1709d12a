"""Crash-point fault injection for the manifest commit protocol.

Every filesystem mutation the protocol performs — manifest ``mkdirs`` /
``create`` / ``rename`` / ``delete`` issued through
``core.manifests._fs``, plus each ``DataFrameWriter.parquet`` delta
write — is an ordering point where the writer can die. These tests kill
the writer immediately BEFORE each such point in turn (publish+replay
for all three incremental dedup indexes, the CDC snapshot sink with
retention retracts, redirect compaction, legacy adoption) and assert
the reader invariants after every crash:

- **no torn read**: the committed-union readers always succeed and
  every directory they resolve is fully readable;
- **no lost committed row**: everything committed before the crashed
  step is still visible in full;
- **replay converges**: re-running the crashed step (batch replay /
  compaction re-run / adoption resume) lands exactly the no-crash end
  state, and a replayed batch never matches its own rows as
  ``dup_of_index`` (self-match would empty the rewritten delta).

The injected kill derives from ``BaseException`` so no production
``except Exception`` can absorb it — it models process death, not a
recoverable error.
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager

import pytest


class InjectedCrash(BaseException):
    """Writer killed at an injected crash point."""


class CrashGate:
    """Counts protocol mutation ops; raises at the ``crash_at``-th."""

    def __init__(self, crash_at: int | None = None):
        self.crash_at = crash_at
        self.ops: list[str] = []

    def hit(self, label: str) -> None:
        self.ops.append(label)
        if self.crash_at is not None and len(self.ops) == self.crash_at:
            raise InjectedCrash(f"crash before op {len(self.ops)}: {label}")


class _FSProxy:
    """Forwards to the real Hadoop FileSystem, gating mutations."""

    _GATED = {"mkdirs", "create", "rename", "delete"}

    def __init__(self, fs, gate: CrashGate):
        self._fs = fs
        self._gate = gate

    def __getattr__(self, name):
        attr = getattr(self._fs, name)
        if name in self._GATED:
            gate = self._gate

            def wrapped(*a, **kw):
                gate.hit(f"fs.{name}")
                return attr(*a, **kw)

            return wrapped
        return attr


@contextmanager
def gated(gate: CrashGate):
    """Route manifests' FS mutations and DataFrameWriter.parquet
    through the gate for the duration of the block."""
    import pyspark.sql.readwriter as rw

    from erpl_web_spark.core import manifests

    real_fs = manifests._fs
    real_parquet = rw.DataFrameWriter.parquet

    def patched_fs(spark, path_str):
        fs, jvm, p = real_fs(spark, path_str)
        return _FSProxy(fs, gate), jvm, p

    def patched_parquet(self, path, *a, **kw):
        gate.hit("write.parquet:" + path.rsplit("/", 1)[-1])
        return real_parquet(self, path, *a, **kw)

    manifests._fs = patched_fs
    rw.DataFrameWriter.parquet = patched_parquet
    try:
        yield
    finally:
        manifests._fs = real_fs
        rw.DataFrameWriter.parquet = real_parquet


def _crash_points(step) -> list[str]:
    """Dry-run ``step`` under an armed-but-never-firing gate to
    enumerate its mutation ops."""
    gate = CrashGate(crash_at=None)
    with gated(gate):
        step()
    return gate.ops


def _run_publish_scenario(
    spark, tmp_path, name, setup_batch0, apply_batch1, read_rows, read_decisions
):
    """Shared driver for the three indexes' publish+replay scenario.

    ``setup_batch0(path)`` commits batch 0 (ungated), ``apply_batch1
    (path)`` is the step under test, ``read_rows(path)`` returns the
    kept-id set, ``read_decisions(path)`` the batch-1 decision map.
    """
    template = str(tmp_path / f"{name}_t")
    setup_batch0(template)
    expected0 = read_rows(template)

    # no-crash dry run on a copy: expected end state + the op list
    dry = str(tmp_path / f"{name}_dry")
    shutil.copytree(template, dry)
    ops = []
    gate = CrashGate(None)
    with gated(gate):
        apply_batch1(dry)
    ops = gate.ops
    expected_full = read_rows(dry)
    expected_dec = read_decisions(dry)
    assert expected0 < expected_full, "scenario must add a keeper"
    assert len(ops) >= 4, f"expected >=4 mutation ops, saw {ops}"

    for k in range(1, len(ops) + 1):
        work = str(tmp_path / f"{name}_k{k}")
        shutil.copytree(template, work)
        with pytest.raises(InjectedCrash):
            with gated(CrashGate(crash_at=k)):
                apply_batch1(work)
        # invariant: reader never tears, batch-0 rows never lost, and
        # the only visible states are pre- or post-commit of batch 1
        got = read_rows(work)
        assert expected0 <= got, f"crash@{k} ({ops[k-1]}): lost committed rows"
        assert got in (expected0, expected_full), (
            f"crash@{k} ({ops[k-1]}): torn state {got}"
        )
        # recovery: replay the batch; must converge to the no-crash
        # state with decisions attributing dups to PRIOR keepers only
        apply_batch1(work)
        assert read_rows(work) == expected_full, f"crash@{k}: replay diverged"
        assert read_decisions(work) == expected_dec, (
            f"crash@{k}: replay decisions diverged (self-match?)"
        )


def _decision_map(spark, path, batch, id_col):
    rows = spark.read.parquet(f"{path}/decisions/batch={batch}").collect()
    return {r[id_col]: (r["status"], r["dup_of"]) for r in rows}


def test_publish_crash_points_lexical_index(spark, tmp_path):
    from erpl_web_spark.operators.dedup import dedup_index_apply, read_dedup_index

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    schema = "doc_id long, text string"

    def setup(path):
        b0 = spark.createDataFrame(
            [(1, base + "one"),
             (4, "completely different organic content with many varied words here " * 4)],
            schema,
        )
        dedup_index_apply(b0, 0, path)

    def step(path):
        b1 = spark.createDataFrame(
            [(10, base.replace("dog", "cat") + "one"),  # near dup of kept 1
             (11, "fresh second batch subject matter entirely its own topic " * 5)],
            schema,
        )
        dedup_index_apply(b1, 1, path)

    def rows(path):
        idx = read_dedup_index(spark, path)
        return set() if idx is None else {r["doc_id"] for r in idx.collect()}

    _run_publish_scenario(
        spark, tmp_path, "lex", setup, step, rows,
        lambda p: _decision_map(spark, p, 1, "doc_id"),
    )
    # the recovered decisions must attribute the near-dup to the
    # batch-0 keeper (1), never to itself or another batch-1 row
    dec = _decision_map(spark, str(tmp_path / "lex_dry"), 1, "doc_id")
    assert dec[10] == ("dup_of_index", 1)
    assert dec[11] == ("kept", None)


def test_publish_crash_points_media_index(spark, tmp_path):
    from erpl_web_spark.operators.multimodal import (
        media_index_apply,
        read_media_index,
    )

    schema = "media_id long, payload binary"

    def setup(path):
        b0 = spark.createDataFrame(
            [(1, b"payload alpha"), (2, b"payload beta")], schema
        )
        media_index_apply(b0, 0, path)

    def step(path):
        b1 = spark.createDataFrame(
            [(10, b"payload alpha"), (11, b"payload gamma")], schema
        )
        media_index_apply(b1, 1, path)

    def rows(path):
        idx = read_media_index(spark, path)
        return set() if idx is None else {r["media_id"] for r in idx.collect()}

    _run_publish_scenario(
        spark, tmp_path, "med", setup, step, rows,
        lambda p: _decision_map(spark, p, 1, "media_id"),
    )
    dec = _decision_map(spark, str(tmp_path / "med_dry"), 1, "media_id")
    assert dec[10] == ("dup_of_index", 1)
    assert dec[11] == ("kept", None)


def test_publish_crash_points_embedding_index(spark, tmp_path):
    from erpl_web_spark.operators.similarity import (
        embedding_index_apply,
        read_embedding_index,
    )

    schema = "vec_id long, embedding array<float>"

    def setup(path):
        b0 = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (50, [0.0, 1.0, 0.0]), (7, [0.7, 0.7, 0.0])],
            schema,
        )
        embedding_index_apply(b0, 0, path, threshold=0.98)

    def step(path):
        b1 = spark.createDataFrame(
            [(100, [0.0, 0.998, 0.02]), (101, [-1.0, 0.0, 0.0])], schema
        )
        embedding_index_apply(b1, 1, path, threshold=0.98)

    def rows(path):
        idx = read_embedding_index(spark, path)
        return set() if idx is None else {r["vec_id"] for r in idx.collect()}

    _run_publish_scenario(
        spark, tmp_path, "emb", setup, step, rows,
        lambda p: _decision_map(spark, p, 1, "vec_id"),
    )
    dec = _decision_map(spark, str(tmp_path / "emb_dry"), 1, "vec_id")
    assert dec[100] == ("dup_of_index", 50)
    assert dec[101] == ("kept", None)


def test_compaction_crash_points(spark, tmp_path):
    """Redirect compaction killed before every FS mutation: the
    distinct committed row set is invariant at EVERY crash point (the
    documented worst case shows merged-away rows twice, never loses or
    tears one), and a re-run compaction converges to the merged
    layout."""
    from erpl_web_spark.core import manifests

    def setup(path):
        for n in range(3):
            spark.createDataFrame(
                [(n * 10 + i, f"row-{n}-{i}") for i in range(2)],
                "id long, val string",
            ).coalesce(1).write.mode("overwrite").parquet(f"{path}/batch={n}")
            manifests.commit_version(spark, path, "batch", n)

    def rows(path):
        df = manifests.read_committed_union(spark, path, "batch")
        return set() if df is None else {
            (r["id"], r["val"]) for r in df.dropDuplicates().collect()
        }

    full = {(n * 10 + i, f"row-{n}-{i}") for n in range(3) for i in range(2)}

    # dry run: op list + expected final layout
    dry = str(tmp_path / "cmp_dry")
    setup(dry)
    gate = CrashGate(None)
    with gated(gate):
        assert manifests.compact_versions(spark, dry, "batch", keep_latest=1) == 2
    ops = gate.ops
    assert rows(dry) == full
    final_dirs = len(manifests.data_dirs(spark, dry, "batch"))
    assert final_dirs == 2  # merged generation + the latest delta
    assert len(ops) >= 5, f"expected >=5 mutation ops, saw {ops}"

    for k in range(1, len(ops) + 1):
        work = str(tmp_path / f"cmp_k{k}")
        setup(work)
        with pytest.raises(InjectedCrash):
            with gated(CrashGate(crash_at=k)):
                manifests.compact_versions(spark, work, "batch", keep_latest=1)
        # invariant: every crash state reads back the full distinct set
        assert rows(work) == full, f"crash@{k} ({ops[k-1]}): row set changed"
        # recovery: compaction re-run self-heals to the merged layout
        manifests.compact_versions(spark, work, "batch", keep_latest=1)
        assert rows(work) == full, f"crash@{k}: recovery lost rows"
        assert len(manifests.data_dirs(spark, work, "batch")) == final_dirs, (
            f"crash@{k}: recovery did not converge to the merged layout"
        )


def test_adoption_crash_points(spark, tmp_path):
    """Legacy adoption killed before every FS mutation: readers either
    still raise the legacy guard (nothing adopted yet) or see a clean
    already-adopted prefix; resuming the adoption commits the rest."""
    from erpl_web_spark.core import manifests

    full = {(n * 10 + i, f"row-{n}-{i}") for n in range(2) for i in range(2)}
    prefixes = [set(), {x for x in full if x[0] < 10}, full]

    def setup(path):
        for n in range(2):
            spark.createDataFrame(
                [(n * 10 + i, f"row-{n}-{i}") for i in range(2)],
                "id long, val string",
            ).coalesce(1).write.mode("overwrite").parquet(f"{path}/batch={n}")

    def rows(path):
        df = manifests.read_committed_union(spark, path, "batch")
        return set() if df is None else {(r["id"], r["val"]) for r in df.collect()}

    dry = str(tmp_path / "ad_dry")
    setup(dry)
    with pytest.raises(RuntimeError, match="pre-manifest"):
        rows(dry)  # un-adopted legacy state must fail loudly, not read empty
    gate = CrashGate(None)
    with gated(gate):
        assert manifests.adopt_success_markers(spark, dry, "batch") == [0, 1]
    ops = gate.ops
    assert rows(dry) == full

    for k in range(1, len(ops) + 1):
        work = str(tmp_path / f"ad_k{k}")
        setup(work)
        with pytest.raises(InjectedCrash):
            with gated(CrashGate(crash_at=k)):
                manifests.adopt_success_markers(spark, work, "batch")
        try:
            got = rows(work)
        except RuntimeError:
            got = None  # legacy guard still armed — acceptable pre-state
        if got is not None:
            assert got in prefixes, f"crash@{k} ({ops[k-1]}): torn state {got}"
        # recovery: adoption resumes where it stopped
        manifests.adopt_success_markers(spark, work, "batch")
        assert rows(work) == full, f"crash@{k}: resume did not converge"


def test_snapshot_sink_crash_points(spark, tmp_path):
    """The CDC snapshot sink (uncommit -> overwrite -> commit-last ->
    retention retract) killed before every FS mutation: the latest
    readable snapshot is always a complete version (the pre- or
    post-batch state, never a torn merge), and replaying the crashed
    batch converges — including the retention retracts."""
    from erpl_web_spark.operators.cdc import (
        merge_to_parquet_snapshots,
        read_latest_snapshot,
    )

    schema = "k long, val string, op string, seq long"

    def apply(path, batch_id, rows, retain=None):
        merge_to_parquet_snapshots(
            spark.createDataFrame(rows, schema), batch_id, path,
            keys=["k"], op_col="op", seq_cols=["seq"],
            retain_versions=retain,
        )

    def setup(path):
        apply(path, 0, [(1, "a0", "U", 0), (2, "b0", "U", 0)])
        apply(path, 1, [(2, "b1", "U", 1), (3, "c1", "U", 1)])

    def snap(path):
        df = read_latest_snapshot(spark, path)
        return None if df is None else {
            (r["k"], r["val"]) for r in df.select("k", "val").collect()
        }

    state1 = {(1, "a0"), (2, "b1"), (3, "c1")}
    batch2 = [(1, "a2", "U", 2), (3, "c1", "D", 2), (4, "d2", "U", 2)]
    state2 = {(1, "a2"), (2, "b1"), (4, "d2")}

    # dry run: op list + expected end state (retain=1 exercises the
    # retention retracts as crash points too)
    dry = str(tmp_path / "snap_dry")
    setup(dry)
    gate = CrashGate(None)
    with gated(gate):
        apply(dry, 2, batch2, retain=1)
    ops = gate.ops
    assert snap(dry) == state2
    assert len(ops) >= 5, f"expected >=5 mutation ops, saw {ops}"

    for k in range(1, len(ops) + 1):
        work = str(tmp_path / f"snap_k{k}")
        setup(work)
        assert snap(work) == state1
        with pytest.raises(InjectedCrash):
            with gated(CrashGate(crash_at=k)):
                apply(work, 2, batch2, retain=1)
        got = snap(work)
        assert got in (state1, state2), (
            f"crash@{k} ({ops[k-1]}): torn snapshot {got}"
        )
        # recovery: Spark replays the batch; the merge re-derives v=2
        # from v=1, never from its own half-written directory
        apply(work, 2, batch2, retain=1)
        assert snap(work) == state2, f"crash@{k}: replay diverged"


def test_line_index_crash_points(spark, tmp_path):
    """The fourth index (incremental line dedup) publishes TWO kinds per
    batch — counts=N then clean=N, each data-first manifest-last. Kill
    the writer before every mutation op of batch 1's apply and assert:
    readers never tear, batch-0 state is never lost, the only visible
    intermediate is counts-committed-without-clean (a true fact about
    the batch), and replay converges to the no-crash end state for BOTH
    the accumulated counts and the rewritten documents."""
    from erpl_web_spark.operators.line_index import (
        line_index_apply,
        read_clean_batches,
        read_line_counts,
    )

    schema = "doc_id long, text string"

    def setup(path):
        b0 = spark.createDataFrame(
            [(1, "alpha body\nshared footer"),
             (2, "beta body\nshared footer"),
             (3, "gamma body\nlate bloomer")],
            schema,
        )
        line_index_apply(b0, 0, path)

    def step(path):
        b1 = spark.createDataFrame(
            [(10, "delta body\nlate bloomer"),
             (11, "epsilon body\nshared footer")],
            schema,
        )
        line_index_apply(b1, 1, path)

    def clean_map(path):
        df = read_clean_batches(spark, path)
        return (
            {}
            if df is None
            else {r["doc_id"]: r["clean_text"] for r in df.collect()}
        )

    def counts_map(path):
        df = read_line_counts(spark, path)
        return (
            {}
            if df is None
            else {r["digest"]: r["n_docs"] for r in df.collect()}
        )

    template = str(tmp_path / "li_t")
    setup(template)
    clean0, counts0 = clean_map(template), counts_map(template)
    assert clean0[1] == "alpha body"  # in-batch hot footer dropped

    dry = str(tmp_path / "li_dry")
    shutil.copytree(template, dry)
    gate = CrashGate(None)
    with gated(gate):
        step(dry)
    ops = gate.ops
    clean_full, counts_full = clean_map(dry), counts_map(dry)
    assert clean_full[10] == "delta body"       # forward-only: hot now
    assert clean_full[3] == "gamma body\nlate bloomer"  # batch 0 untouched
    assert len(ops) >= 6, f"expected >=6 mutation ops, saw {ops}"

    for k in range(1, len(ops) + 1):
        work = str(tmp_path / f"li_k{k}")
        shutil.copytree(template, work)
        with pytest.raises(InjectedCrash):
            with gated(CrashGate(crash_at=k)):
                step(work)
        got_clean, got_counts = clean_map(work), counts_map(work)
        assert set(clean0) <= set(got_clean), (
            f"crash@{k} ({ops[k-1]}): lost committed clean rows"
        )
        assert got_clean in (clean0, clean_full), (
            f"crash@{k} ({ops[k-1]}): torn clean state"
        )
        assert got_counts in (counts0, counts_full), (
            f"crash@{k} ({ops[k-1]}): torn counts state"
        )
        if got_clean == clean_full:
            # clean commits AFTER counts: clean-new without counts-new
            # must be impossible
            assert got_counts == counts_full, (
                f"crash@{k} ({ops[k-1]}): clean committed before counts"
            )
        # recovery: replay converges for both kinds
        step(work)
        assert clean_map(work) == clean_full, f"crash@{k}: clean replay diverged"
        assert counts_map(work) == counts_full, f"crash@{k}: counts replay diverged"


def test_url_index_crash_points(spark, tmp_path):
    """The fifth index (incremental URL dedup) publishes TWO kinds per
    batch — urls=N then kept=N, each data-first manifest-last. Kill the
    writer before every mutation op of batch 1's apply and assert:
    readers never tear, batch-0 claims and kept rows are never lost,
    the only visible intermediate is urls-committed-without-kept
    (replay-convergent by the strictly-below-N read rule), and replay
    converges to the no-crash end state for both kinds."""
    from erpl_web_spark.operators.url_index import (
        read_kept_batches,
        read_url_index,
        url_index_apply,
    )

    schema = "doc_id long, url string"

    def setup(path):
        b0 = spark.createDataFrame(
            [(1, "HTTP://WWW.A.com:80/x/?b=2&a=1#f"),
             (2, "http://a.com/x?a=1&b=2"),
             (3, "https://b.com/y")],
            schema,
        )
        url_index_apply(b0, 0, path)

    def step(path):
        b1 = spark.createDataFrame(
            [(10, "http://a.com/x?utm_source=z&a=1&b=2"),
             (12, "https://c.com/z?p=1")],
            schema,
        )
        url_index_apply(b1, 1, path)

    def kept_map(path):
        df = read_kept_batches(spark, path)
        return (
            {}
            if df is None
            else {r["doc_id"]: r["canonical_url"] for r in df.collect()}
        )

    def claim_set(path):
        df = read_url_index(spark, path)
        return (
            set()
            if df is None
            else {(r["digest"], r["batch_src"]) for r in df.collect()}
        )

    template = str(tmp_path / "ui_t")
    setup(template)
    kept0, claims0 = kept_map(template), claim_set(template)
    assert set(kept0) == {1, 3}  # min-id winner within batch 0

    dry = str(tmp_path / "ui_dry")
    shutil.copytree(template, dry)
    gate = CrashGate(None)
    with gated(gate):
        step(dry)
    ops = gate.ops
    kept_full, claims_full = kept_map(dry), claim_set(dry)
    assert set(kept_full) == {1, 3, 12}  # 10's canonical claimed by 1
    assert len(ops) >= 6, f"expected >=6 mutation ops, saw {ops}"

    for k in range(1, len(ops) + 1):
        work = str(tmp_path / f"ui_k{k}")
        shutil.copytree(template, work)
        with pytest.raises(InjectedCrash):
            with gated(CrashGate(crash_at=k)):
                step(work)
        got_kept, got_claims = kept_map(work), claim_set(work)
        assert set(kept0) <= set(got_kept), (
            f"crash@{k} ({ops[k-1]}): lost committed kept rows"
        )
        assert got_kept in (kept0, kept_full), (
            f"crash@{k} ({ops[k-1]}): torn kept state"
        )
        assert got_claims in (claims0, claims_full), (
            f"crash@{k} ({ops[k-1]}): torn claim state"
        )
        if got_kept == kept_full:
            # kept commits AFTER urls: kept-new without urls-new
            # must be impossible
            assert got_claims == claims_full, (
                f"crash@{k} ({ops[k-1]}): kept committed before urls"
            )
        # recovery: replay converges for both kinds
        step(work)
        assert kept_map(work) == kept_full, f"crash@{k}: kept replay diverged"
        assert claim_set(work) == claims_full, f"crash@{k}: claim replay diverged"


def test_repave_crash_points(spark, tmp_path):
    """line_index_repave killed before every FS mutation: at every
    crash point the clean union reads back complete (each version is
    its FULL old or FULL new content — the redirect switch is atomic,
    so never torn, duplicated, or missing a doc), the counts facts are
    byte-invariant, and a re-run repave converges to the batch-operator
    end state."""
    from erpl_web_spark.operators.line_index import (
        line_index_apply,
        line_index_repave,
        read_clean_batches,
        read_line_counts,
    )

    def setup(path):
        b0 = spark.createDataFrame(
            [
                (1, "alpha body\nshared footer"),
                (2, "beta body\nshared footer"),
                (3, "gamma body\nlate bloomer"),
            ],
            "doc_id long, text string",
        )
        b1 = spark.createDataFrame(
            [
                (10, "delta body\nlate bloomer"),
                (11, "epsilon body\nshared footer"),
            ],
            "doc_id long, text string",
        )
        line_index_apply(b0, 0, path)
        line_index_apply(b1, 1, path)
        # plant an orphan generation dir (no manifest names it — the
        # residue of a crashed earlier repave): the orphan sweep's
        # fs.delete becomes one more gated crash point, and recovery
        # must still converge with the orphan gone
        orphan = os.path.join(path, "clean=0.r9")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "stale.bin"), "w") as f:
            f.write("stale")

    def clean(path):
        return {
            r["doc_id"]: r["clean_text"]
            for r in read_clean_batches(spark, path).collect()
        }

    def counts(path):
        return {
            r["digest"]: r["n_docs"]
            for r in read_line_counts(spark, path).collect()
        }

    before = {
        1: "alpha body", 2: "beta body", 3: "gamma body\nlate bloomer",
        10: "delta body", 11: "epsilon body",
    }
    after = {**before, 3: "gamma body"}  # repave drops the late-hot line

    dry = str(tmp_path / "rp_dry")
    setup(dry)
    assert clean(dry) == before
    counts_ref = counts(dry)
    gate = CrashGate(None)
    with gated(gate):
        assert line_index_repave(spark, dry) == 2
    ops = gate.ops
    assert clean(dry) == after
    assert counts(dry) == counts_ref
    assert not os.path.exists(os.path.join(dry, "clean=0.r9"))  # swept
    assert len(ops) >= 5, f"expected >=5 mutation ops (incl. sweep), saw {ops}"

    for k in range(1, len(ops) + 1):
        work = str(tmp_path / f"rp_k{k}")
        setup(work)
        with pytest.raises(InjectedCrash):
            with gated(CrashGate(crash_at=k)):
                line_index_repave(spark, work)
        got = clean(work)
        assert set(got) == set(before), f"crash@{k} ({ops[k-1]}): doc set changed"
        for d, txt in got.items():
            assert txt in (before[d], after[d]), (
                f"crash@{k} ({ops[k-1]}): doc {d} torn: {txt!r}"
            )
        assert counts(work) == counts_ref, f"crash@{k}: counts changed"
        # recovery: a re-run converges to the batch-operator end state
        line_index_repave(spark, work)
        assert clean(work) == after, f"crash@{k}: recovery did not converge"
        assert counts(work) == counts_ref
        assert not os.path.exists(os.path.join(work, "clean=0.r9")), (
            f"crash@{k}: recovery left the orphan generation unswept"
        )


def test_url_index_bloom_crash_points(spark, tmp_path):
    """Bloom-mode URL index publishes THREE kinds per batch in commit
    order urls -> bloomw -> kept. Kill the writer before every mutation
    op of batch 1's apply and assert: the only visible batch-1 states
    are PREFIXES of that order (kept committed implies bloomw committed
    implies urls committed — a kept/bloomw commit can never precede its
    claim set), committed batch-0 state is never lost, replay with the
    knob on converges to the no-crash end state, and after replay the
    bloomw versions COVER the urls versions (so the next batch trusts
    the pre-filter instead of falling back)."""
    from erpl_web_spark.core import manifests
    from erpl_web_spark.operators.url_index import (
        read_kept_batches,
        read_url_index,
        url_index_apply,
    )

    schema = "doc_id long, url string"
    M, K = 4096, 3

    def setup(path):
        b0 = spark.createDataFrame(
            [(1, "HTTP://WWW.A.com:80/x/?b=2&a=1#f"),
             (2, "http://a.com/x?a=1&b=2"),
             (3, "https://b.com/y")],
            schema,
        )
        url_index_apply(b0, 0, path, bloom_m_bits=M, bloom_k=K)

    def step(path):
        b1 = spark.createDataFrame(
            [(10, "http://a.com/x?utm_source=z&a=1&b=2"),
             (12, "https://c.com/z?p=1")],
            schema,
        )
        url_index_apply(b1, 1, path, bloom_m_bits=M, bloom_k=K)

    def kept_ids(path):
        df = read_kept_batches(spark, path)
        return set() if df is None else {r["doc_id"] for r in df.collect()}

    def claims(path):
        df = read_url_index(spark, path)
        return set() if df is None else {
            (r["digest"], r["batch_src"]) for r in df.collect()
        }

    def committed(path, kind):
        return set(manifests.committed_versions(spark, path, kind))

    template = str(tmp_path / "uib_t")
    setup(template)
    kept0, claims0 = kept_ids(template), claims(template)
    assert kept0 == {1, 3}
    assert committed(template, "bloomw") == {0}

    dry = str(tmp_path / "uib_dry")
    shutil.copytree(template, dry)
    gate = CrashGate(None)
    with gated(gate):
        step(dry)
    ops = gate.ops
    kept_full, claims_full = kept_ids(dry), claims(dry)
    assert kept_full == {1, 3, 12}
    assert committed(dry, "bloomw") == {0, 1}
    # the bloomw publish adds mutation ops beyond the knob-off scenario
    assert len(ops) >= 8, f"expected >=8 mutation ops with bloom on, saw {ops}"

    for k in range(1, len(ops) + 1):
        work = str(tmp_path / f"uib_k{k}")
        shutil.copytree(template, work)
        with pytest.raises(InjectedCrash):
            with gated(CrashGate(crash_at=k)):
                step(work)
        got_kept, got_claims = kept_ids(work), claims(work)
        assert kept0 <= got_kept, f"crash@{k} ({ops[k-1]}): lost kept rows"
        assert got_kept in (kept0, kept_full), (
            f"crash@{k} ({ops[k-1]}): torn kept state"
        )
        assert got_claims in (claims0, claims_full), (
            f"crash@{k} ({ops[k-1]}): torn claim state"
        )
        u, bw, kp = (
            1 in committed(work, "urls"),
            1 in committed(work, "bloomw"),
            1 in committed(work, "kept"),
        )
        # prefix-of-commit-order invariant: kept => bloomw => urls
        assert (not kp or bw) and (not bw or u), (
            f"crash@{k} ({ops[k-1]}): commit order violated "
            f"(urls={u}, bloomw={bw}, kept={kp})"
        )
        # recovery: replay with the knob on converges, and coverage
        # holds so the NEXT batch trusts the pre-filter
        step(work)
        assert kept_ids(work) == kept_full, f"crash@{k}: kept replay diverged"
        assert claims(work) == claims_full, f"crash@{k}: claim replay diverged"
        assert committed(work, "urls") <= committed(work, "bloomw"), (
            f"crash@{k}: bloomw does not cover urls after replay"
        )
