"""ManifestTable: transactional commits, snapshot isolation, time travel,
pruned merge, vacuum (operators/table_format.py)."""

from __future__ import annotations

import os

import pytest

from verified_sources_spark.operators.table_format import CommitConflict, ManifestTable


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_append_read_roundtrip_with_partitions(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "t"), partition_by=["day"], fs=sink_fs)
    t.append(spark.createDataFrame([("2024-01-01", 1, "a")], "day string, k long, v string"))
    t.append(spark.createDataFrame([("2024-01-02", 2, "b")], "day string, k long, v string"))
    df = t.read()
    assert {c for c in df.columns} == {"day", "k", "v"}  # partition col preserved
    assert {(str(r["day"]), r["k"], r["v"]) for r in df.collect()} == {
        ("2024-01-01", 1, "a"), ("2024-01-02", 2, "b"),
    }
    assert t.versions() == [1, 2]


def test_merge_prunes_and_time_travels(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "t"), partition_by=["day"], fs=sink_fs)
    t.append(
        spark.createDataFrame(
            [("2024-01-01", 1, "a"), ("2024-01-02", 2, "b"), ("2024-01-03", 3, "c")],
            "day string, k long, v string",
        )
    )
    v1_files = {e["path"] for e in t._manifest(1)["files"]}
    untouched_v1 = {p for p in v1_files if "day=2024-01-03" in p}
    assert untouched_v1

    t.merge(
        spark.createDataFrame([("2024-01-01", 1, "a2")], "day string, k long, v string"),
        keys=["k"],
    )
    v2_files = {e["path"] for e in t._manifest(2)["files"]}
    # untouched partition's FILES carry over verbatim in the new manifest
    assert untouched_v1 <= v2_files
    # touched partition got new files; old ones still on disk (time travel)
    assert {(r["k"], r["v"]) for r in t.read().select("k", "v").collect()} == {
        (1, "a2"), (2, "b"), (3, "c"),
    }
    assert {(r["k"], r["v"]) for r in t.read(version=1).select("k", "v").collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }


def test_snapshot_isolation_reader_pinned_across_merge(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "t"), partition_by=["day"], fs=sink_fs)
    t.append(spark.createDataFrame([("2024-01-01", 1, "a")], "day string, k long, v string"))
    pinned = t.read(version=1)  # lazy plan holding v1's file list
    t.merge(
        spark.createDataFrame([("2024-01-01", 1, "NEW")], "day string, k long, v string"),
        keys=["k"],
    )
    # the pinned reader still sees v1 — its files were not deleted
    assert [r["v"] for r in pinned.collect()] == ["a"]
    assert [r["v"] for r in t.read().collect()] == ["NEW"]


def test_hard_delete_and_unpartitioned_merge(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.merge(
        spark.createDataFrame([(1, None, 99)], "k long, v string, del long"),
        keys=["k"],
        hard_delete_col="del",
    )
    assert _rows(t.read()) == {(2, "b")}
    assert _rows(t.read(version=1)) == {(1, "a"), (2, "b")}


def test_vacuum_drops_unreferenced_files_keeps_latest(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "t"), partition_by=["day"], fs=sink_fs)
    t.append(spark.createDataFrame([("2024-01-01", 1, "a")], "day string, k long, v string"))
    t.merge(
        spark.createDataFrame([("2024-01-01", 1, "a2")], "day string, k long, v string"),
        keys=["k"],
    )
    deleted = t.vacuum(keep_versions=1)
    assert deleted  # v1's replaced file went away
    assert t.versions() == [2]
    assert [r["v"] for r in t.read().collect()] == ["a2"]
    with pytest.raises(FileNotFoundError):
        open(os.path.join(str(tmp_path / "t"), "_manifests", "v1.json"))


def test_commit_conflict_on_racing_writer(spark, tmp_path, sink_fs):
    t1 = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    t2 = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    t1.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    # simulate the race: t2 resolved base=1, then t1 commits v2 first
    entries = t2._write_files(spark.createDataFrame([(2, "b")], "k long, v string"))
    t1.append(spark.createDataFrame([(3, "c")], "k long, v string"))  # commits v2
    with pytest.raises(CommitConflict):
        t2._commit(entries, base_version=1)  # stale base -> v2 taken
    # the winning commit was not clobbered
    assert {e["path"] for e in t1._manifest(2)["files"]} >= {
        e["path"] for e in t1._manifest(1)["files"]
    }


def test_delete_everything_keeps_schema(spark, tmp_path, sink_fs):
    """A merge that hard-deletes every row commits an EMPTY version that
    still reads back with the table's schema (recorded in the manifest)."""
    t = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.merge(
        spark.createDataFrame([(1, None, 9)], "k long, v string, del long"),
        keys=["k"],
        hard_delete_col="del",
    )
    empty = t.read()
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "v"}


def test_manifest_merge_with_hive_escaped_partition_values(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "t"), partition_by=["shard"], fs=sink_fs)
    t.append(
        spark.createDataFrame(
            [("us:east", 1, "a"), ("eu:west", 2, "b")], "shard string, k long, v string"
        )
    )
    t.merge(
        spark.createDataFrame([("us:east", 1, "a2")], "shard string, k long, v string"),
        keys=["k"],
    )
    rows = {r["k"]: (r["shard"], r["v"]) for r in t.read().collect()}
    assert rows == {1: ("us:east", "a2"), 2: ("eu:west", "b")}
    # untouched eu:west file carried over verbatim into v2
    v1 = {e["path"] for e in t._manifest(1)["files"] if e["partition"]["shard"] == "eu:west"}
    v2 = {e["path"] for e in t._manifest(2)["files"]}
    assert v1 and v1 <= v2


def test_scan_skips_files_by_column_stats(spark, tmp_path, sink_fs):
    """Footer min/max recorded at commit time prune files from the scan;
    results stay exact because the residual predicate is always applied."""
    t = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    t.append(spark.createDataFrame([(k, f"v{k}") for k in range(0, 50)],
                                   "k long, v string").coalesce(1))
    t.append(spark.createDataFrame([(k, f"v{k}") for k in range(50, 100)],
                                   "k long, v string").coalesce(1))
    all_entries = t._manifest(t.latest_version())["files"]
    assert all(e.get("stats") for e in all_entries)  # stats recorded at commit
    assert all(e["stats"]["rows"] == 50 for e in all_entries)

    cand = t.candidate_entries([("k", ">=", 75)])
    assert len(cand) == 1 and len(all_entries) == 2  # low-range file skipped
    got = _rows(t.scan([("k", ">=", 75)]))
    assert got == _rows(t.read().where("k >= 75"))
    # conjunction that no file satisfies -> empty scan, schema intact
    none = t.scan([("k", ">", 20), ("k", "<", 30), ("v", "=", "nope")])
    assert none.count() == 0 and set(none.columns) == {"k", "v"}


def test_scan_partition_pruning_and_string_stats(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "t"), partition_by=["day"], fs=sink_fs)
    t.append(
        spark.createDataFrame(
            [("2024-01-01", 1, "apple"), ("2024-01-02", 2, "banana"),
             ("2024-01-03", 3, "cherry")],
            "day string, k long, v string",
        )
    )
    def kv(df):  # hive partition col is type-inferred and ordered last
        return {(str(r["day"]), r["k"], r["v"]) for r in df.collect()}

    # equality on the partition column prunes by rendered partition value
    assert len(t.candidate_entries([("day", "=", "2024-01-02")])) == 1
    assert kv(t.scan([("day", "=", "2024-01-02")])) == {("2024-01-02", 2, "banana")}
    # IN-list on the partition column
    cand = t.candidate_entries([("day", "in", ["2024-01-01", "2024-01-03"])])
    assert len(cand) == 2
    # range op on hive-rendered partition strings must NOT prune (unsafe)
    assert len(t.candidate_entries([("day", ">", "2024-01-02")])) == 3
    assert kv(t.scan([("day", ">", "2024-01-02")])) == {("2024-01-03", 3, "cherry")}
    # string-column stats prune data files too
    assert len(t.candidate_entries([("v", "=", "banana")])) == 1


def test_scan_without_stats_never_skips(spark, tmp_path, sink_fs):
    """Entries with no stats (e.g. object-store footers unreadable from the
    driver) are never pruned — correctness does not depend on stats."""
    import json as _json

    t = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    t.append(spark.createDataFrame([(k,) for k in range(10)], "k long").coalesce(1))
    t.append(spark.createDataFrame([(k,) for k in range(10, 20)], "k long").coalesce(1))
    m = t._manifest(2)
    for e in m["files"]:
        e.pop("stats", None)
    sink_fs.remove(f"{t.path}/_manifests/v2.json")
    sink_fs.create_exclusive(f"{t.path}/_manifests/v2.json", _json.dumps(m))
    assert len(t.candidate_entries([("k", ">=", 15)])) == 2  # nothing skipped
    assert _rows(t.scan([("k", ">=", 15)])) == {(k,) for k in range(15, 20)}


def test_compact_coalesces_small_files(spark, tmp_path, sink_fs):
    """Many small appends -> one compacted file per partition; rows
    unchanged, big files untouched, old version still time-travels."""
    t = ManifestTable(spark, str(tmp_path / "t"), partition_by=["day"], fs=sink_fs)
    for i in range(6):
        t.append(
            spark.createDataFrame(
                [(f"2024-01-0{1 + i % 2}", i, f"v{i}")], "day string, k long, v string"
            )
        )
    v_before = t.latest_version()
    n_before = len(t._manifest(v_before)["files"])
    assert n_before >= 6
    before = {(str(r["day"]), r["k"], r["v"]) for r in t.read().collect()}

    v = t.compact(target_file_bytes=1 << 30)
    assert v == v_before + 1
    after_entries = t._manifest(v)["files"]
    # one file per partition now (2 partitions), all with sizes + stats
    assert len(after_entries) == 2
    assert all("bytes" in e and e.get("stats") for e in after_entries)
    assert {(str(r["day"]), r["k"], r["v"]) for r in t.read().collect()} == before
    # purely physical: the pre-compaction version still reads identically
    assert {
        (str(r["day"]), r["k"], r["v"]) for r in t.read(version=v_before).collect()
    } == before
    # second compact is a no-op
    assert t.compact(target_file_bytes=1 << 30) is None
    # vacuum now reclaims the replaced small files
    assert len(t.vacuum(keep_versions=1)) >= 4


def test_compact_cluster_by_makes_skipping_surgical(spark, tmp_path, sink_fs):
    """OPTIMIZE-with-clustering: after compact(cluster_by=[k]), output
    files cover disjoint k ranges, so a point predicate prunes to one
    file via the recorded stats."""
    import random

    t = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    rng = random.Random(7)
    ks = list(range(2000))
    rng.shuffle(ks)
    for i in range(4):  # interleaved appends: every file spans ~full k range
        chunk = ks[i * 500 : (i + 1) * 500]
        t.append(spark.createDataFrame([(k, "x" * 40) for k in chunk],
                                       "k long, v string").coalesce(1))
    # un-clustered: every file may contain any k -> nothing prunes
    assert len(t.candidate_entries([("k", "=", 1234)])) == 4

    v = t.compact(target_file_bytes=4 * 1024, cluster_by=["k"])
    assert v is not None
    n_files = len(t._manifest(v)["files"])
    assert n_files >= 2
    hits = t.candidate_entries([("k", "=", 1234)])
    assert len(hits) == 1  # disjoint ranges -> exactly one candidate
    assert {r["k"] for r in t.scan([("k", "=", 1234)]).collect()} == {1234}
    assert t.read().count() == 2000


def test_compact_leaves_large_files_alone(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    t.append(spark.createDataFrame([(k, "x" * 50) for k in range(5000)],
                                   "k long, v string").coalesce(1))  # "large"
    big = {e["path"] for e in t._manifest(1)["files"]}
    t.append(spark.createDataFrame([(99990, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(99991, "b")], "k long, v string"))
    v = t.compact(target_file_bytes=1 << 30, small_file_bytes=10 * 1024)
    assert v is not None
    after = {e["path"] for e in t._manifest(v)["files"]}
    assert big <= after  # the large file carried over byte-identical
    assert t.read().count() == 5002


def test_two_concurrent_writers_one_conflict_then_converge(spark, tmp_path, sink_fs):
    """Two writers race the same commit version: exactly one CommitConflict,
    the loser retries against the fresh log, and no update is lost.

    DETERMINISTIC interleaving (r8): the second writer's whole append is
    injected INSIDE the first writer's read-modify-write window — after
    writer A staged its files and computed version 2, at the instant it
    calls the exclusive create, writer B commits v2 first.  The conflict
    is therefore forced by construction, not raced by threads against a
    wall-clock barrier (the r6/r7 formulation flaked under core
    contention: a timed-out barrier silently serialized the writers and
    voided the exactly-one-conflict claim)."""
    path_t = str(tmp_path / "t")
    df_a = spark.createDataFrame([(1, "a")], "k long, v string")
    df_b = spark.createDataFrame([(2, "b")], "k long, v string")
    state = {"injected": 0}

    class InjectingFS:
        """Delegates to the real backend, but the first time writer A
        tries to create the v2 manifest, runs writer B's full append
        (stage + commit v2) before letting A's create proceed — the
        exact lost-update window snapshot isolation must arbitrate."""

        def __init__(self, inner):
            self.inner = inner

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def create_exclusive(self, path, text):
            if path.endswith("v2.json") and not state["injected"]:
                state["injected"] += 1
                ManifestTable(spark, path_t, fs=sink_fs).append(df_b)
            self.inner.create_exclusive(path, text)

    base = ManifestTable(spark, path_t, fs=sink_fs)
    base.append(spark.createDataFrame([(0, "base")], "k long, v string"))  # v1

    t = ManifestTable(spark, path_t, fs=InjectingFS(sink_fs))
    conflicts = 0
    for _ in range(5):
        try:
            t.append(df_a)
            break
        except CommitConflict:
            conflicts += 1
    else:
        raise AssertionError("retries exhausted")

    assert state["injected"] == 1
    assert conflicts == 1  # exactly one loser, exactly one retry
    final = ManifestTable(spark, path_t, fs=sink_fs)
    assert final.versions() == [1, 2, 3]
    # no lost update: the retry rebuilt on the winner's manifest
    assert {(r["k"], r["v"]) for r in final.read().collect()} == {
        (0, "base"), (1, "a"), (2, "b"),
    }


# -------------------------------------------------------------------------
# Object-store commit atomicity (operators/fs.py commit backends)
# -------------------------------------------------------------------------


class _SimulatedObjectStore:
    """S3-shaped blob namespace for the commit-race tests.  Blobs land on
    the local disk (so ManifestTable's reads see them); an injectable
    ``hold`` callback stalls every writer between its existence check and
    its write, forcing the check-then-create race window deterministically
    instead of hoping two threads interleave."""

    def __init__(self, hold=None):
        import threading

        self.hold = hold or (lambda: None)
        self._cas = threading.Lock()

    # -- what FS.create_exclusive degrades to on a store WITHOUT
    #    conditional write: check, (window), create — NOT atomic
    def naive_put_if_absent(self, path: str, text: str) -> None:
        if os.path.exists(path):
            raise FileExistsError(path)
        self.hold()
        with open(path, "w") as f:
            f.write(text)

    # -- conditional write (S3 `If-None-Match: *` / GCS ifGenerationMatch=0):
    #    the STORE arbitrates — decision and visibility are one atomic op
    def put_if_none_match(self, path: str, data: bytes) -> bool:
        self.hold()
        with self._cas:
            if os.path.exists(path):
                return False
            with open(path, "wb") as f:
                f.write(data)
            return True


class _NaiveStoreBackend:
    """CommitBackend over the store's non-atomic personality."""

    def __init__(self, store):
        self.store = store

    def put_if_absent(self, path: str, text: str) -> None:
        self.store.naive_put_if_absent(path, text)


def _race_two_appends(spark, tmp_path, sink_fs, make_backend):
    """Drive two writers into the same commit version with the race window
    held open; returns (n_conflicts, final_table)."""
    import threading

    barrier = threading.Barrier(2, timeout=60)
    calls, calls_lock = [0], threading.Lock()

    def hold():
        # only the first, racing attempt per writer holds (calls 1 and 2 —
        # the Spark write before each put can be slow under load, so the
        # window must WAIT for both parties, not time out and serialize the
        # race); retries after a conflict run solo and skip the barrier
        with calls_lock:
            calls[0] += 1
            nth = calls[0]
        if nth <= 2:
            try:
                barrier.wait(timeout=60)
            except threading.BrokenBarrierError:
                pass

    store = _SimulatedObjectStore(hold=hold)
    base = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)
    base.append(spark.createDataFrame([(0, "base")], "k long, v string"))  # v1

    conflicts, errors = [], []

    def writer(df):
        # one backend PER WRITER (sharing the store/coordinator through
        # make_backend's closure): two real writers are two distinct
        # owner identities — a shared backend instance would race one
        # owner against itself, which lock-with-TTL legitimately allows
        try:
            backend = make_backend(store)
            t = ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs, commit_backend=backend)
            for _ in range(5):
                try:
                    t.append(df)
                    return
                except CommitConflict:
                    conflicts.append(1)
            errors.append("retries exhausted")
        except Exception as e:
            errors.append(f"writer raised: {e!r}")

    th_a = threading.Thread(
        target=writer, args=(spark.createDataFrame([(1, "a")], "k long, v string"),)
    )
    th_b = threading.Thread(
        target=writer, args=(spark.createDataFrame([(2, "b")], "k long, v string"),)
    )
    th_a.start(); th_b.start()
    # join margin must exceed the barrier timeout + both commits, or a
    # loaded machine asserts against threads that have not finished
    th_a.join(timeout=300); th_b.join(timeout=300)
    assert not errors
    return len(conflicts), ManifestTable(spark, str(tmp_path / "t"), fs=sink_fs)


def test_naive_object_store_commit_loses_an_update(spark, tmp_path, sink_fs):
    """Control: check-then-create on an object store is NOT a commit atom.
    Both writers pass the existence check inside the held-open window,
    both believe they committed v2, and one manifest silently clobbers
    the other — a lost update.  This is the failure mode the pluggable
    backends exist to close; if this test ever starts conflicting, the
    simulated race window is broken and the backend tests prove nothing."""
    n_conflicts, final = _race_two_appends(
        spark, tmp_path, sink_fs, lambda store: _NaiveStoreBackend(store)
    )
    assert n_conflicts == 0          # neither writer saw the other
    assert final.versions() == [1, 2]  # two commits, one surviving manifest
    rows = {(r["k"], r["v"]) for r in final.read().collect()}
    assert (0, "base") in rows
    assert len(rows) == 2            # one of the two appends vanished


@pytest.mark.parametrize("kind", ["conditional_put", "lock_table"])
def test_object_store_backends_guarantee_one_winner(spark, tmp_path, sink_fs, kind):
    """Same forced race, real backends: exactly one writer wins v2, the
    loser gets CommitConflict, retries on the fresh log, and no update is
    lost."""
    from verified_sources_spark.operators.fs import (
        ConditionalPutCommitBackend,
        InProcessCoordinator,
        LocalFS,
        LockTableCommitBackend,
    )

    coord = InProcessCoordinator()  # shared: ONE coordinator, two owners

    def make_backend(store):
        if kind == "conditional_put":
            return ConditionalPutCommitBackend(store)

        class _HoldingLockBackend(LockTableCommitBackend):
            # route the forced hold through the claim path: both writers
            # arrive at the coordinator together, then CAS arbitrates
            def put_if_absent(self, path, text):
                store.hold()
                return super().put_if_absent(path, text)

        return _HoldingLockBackend(coord, LocalFS())

    n_conflicts, final = _race_two_appends(spark, tmp_path, sink_fs, make_backend)
    # at least one conflict (the forced race) — the loser may conflict
    # MORE than once when it retries before the winner's multi-step
    # commit (fence write + token check + promote) becomes visible;
    # extra retries are benign, losing an update is not
    assert n_conflicts >= 1
    assert final.versions() == [1, 2, 3]
    assert {(r["k"], r["v"]) for r in final.read().collect()} == {
        (0, "base"), (1, "a"), (2, "b"),
    }


def test_lock_table_ttl_steal_after_crashed_winner():
    """A claim whose owner died before writing the manifest must not wedge
    the log forever: past the TTL the claim is stealable — but only
    because the file never appeared."""
    from verified_sources_spark.operators.fs import InProcessCoordinator

    t = [0.0]
    coord = InProcessCoordinator(ttl_s=60.0, clock=lambda: t[0])
    assert coord.try_claim("v2.json", "crasher")
    assert coord.try_claim("v2.json", "crasher")      # idempotent re-claim
    assert not coord.try_claim("v2.json", "other")    # fresh claim holds
    t[0] = 59.0
    assert not coord.try_claim("v2.json", "other")    # still fresh
    t[0] = 61.0
    assert coord.try_claim("v2.json", "other")        # expired: stolen
    assert not coord.try_claim("v2.json", "crasher")  # original now locked out


def test_lock_table_backend_fails_fast_on_committed_path(tmp_path):
    """An already-committed manifest path conflicts without burning a
    coordinator claim."""
    from verified_sources_spark.operators.fs import (
        InProcessCoordinator,
        LocalFS,
        LockTableCommitBackend,
    )

    coord = InProcessCoordinator()
    backend = LockTableCommitBackend(coord, LocalFS(), owner="w1")
    p = str(tmp_path / "v1.json")
    backend.put_if_absent(p, '{"version": 1}')
    with pytest.raises(FileExistsError):
        backend.put_if_absent(p, '{"version": 1, "other": true}')
    # the claim table never saw a second entry for a committed path
    other = LockTableCommitBackend(coord, LocalFS(), owner="w2")
    with pytest.raises(FileExistsError):
        other.put_if_absent(p, "{}")


@pytest.mark.parametrize("backend_kind", ["conditional_put", "lock_table"])
def test_many_writer_contention_serializes_without_loss(
    spark, tmp_path, sink_fs, backend_kind
):
    """Scale shape of the commit protocol: FOUR concurrent writers, TWO
    appends each, all racing the same log — over BOTH object-store
    backends.  Every append must eventually land (retry-on-conflict),
    versions must be contiguous, and the final table must contain every
    row exactly once — the multi-job cluster scenario, not just the
    two-writer race."""
    import threading

    from verified_sources_spark.operators.fs import (
        ConditionalPutCommitBackend,
        InProcessCoordinator,
        LocalFS,
        LockTableCommitBackend,
    )

    coord = InProcessCoordinator()  # shared CAS service; one owner per writer
    store = _SimulatedObjectStore()
    base = ManifestTable(spark, str(tmp_path / "mw"), fs=sink_fs)
    base.append(spark.createDataFrame([(0, "base")], "k long, v string"))

    errors = []

    def writer(widx):
        backend = (
            ConditionalPutCommitBackend(store)
            if backend_kind == "conditional_put"
            else LockTableCommitBackend(coord, LocalFS(), owner=f"w{widx}")
        )
        t = ManifestTable(
            spark, str(tmp_path / "mw"), fs=sink_fs, commit_backend=backend
        )
        for j in range(2):
            df = spark.createDataFrame([(widx * 10 + j, f"w{widx}-{j}")], "k long, v string")
            for _ in range(20):
                try:
                    t.append(df)
                    break
                except CommitConflict:
                    continue
                except Exception as e:
                    errors.append(f"writer {widx} raised: {e!r}")
                    return
            else:
                errors.append(f"writer {widx} append {j} never landed")

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(1, 5)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors
    final = ManifestTable(spark, str(tmp_path / "mw"), fs=sink_fs)
    assert final.versions() == list(range(1, 10))  # 1 base + 8 appends
    rows = {(r["k"], r["v"]) for r in final.read().collect()}
    expected = {(0, "base")} | {
        (w * 10 + j, f"w{w}-{j}") for w in range(1, 5) for j in range(2)
    }
    assert rows == expected


def test_concurrent_merges_preserve_both_writers_rows(spark, tmp_path, sink_fs):
    """Two writers MERGE different keys concurrently (partitioned table,
    overlapping partitions).  The base+1 commit rule forces the loser to
    recompute its keep-list from the winner's manifest on retry, so both
    upserts land and untouched rows survive — the merge-path analogue of
    the append contention test."""
    import threading

    from verified_sources_spark.operators.fs import ConditionalPutCommitBackend

    store = _SimulatedObjectStore()
    base = ManifestTable(spark, str(tmp_path / "cm"), partition_by=["day"], fs=sink_fs)
    base.append(spark.createDataFrame(
        [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c")],
        "day string, k long, v string"))

    errors = []

    def merger(key, new_v):
        t = ManifestTable(
            spark, str(tmp_path / "cm"), partition_by=["day"], fs=sink_fs,
            commit_backend=ConditionalPutCommitBackend(store),
        )
        df = spark.createDataFrame([("d1", key, new_v)], "day string, k long, v string")
        for _ in range(20):
            try:
                t.merge(df, keys=["k"])
                return
            except CommitConflict:
                continue
            except Exception as e:
                errors.append(f"merger raised: {e!r}")
                return
        errors.append(f"merge of k={key} never landed")

    th_a = threading.Thread(target=merger, args=(1, "a2"))
    th_b = threading.Thread(target=merger, args=(2, "b2"))
    th_a.start(); th_b.start()
    th_a.join(timeout=300); th_b.join(timeout=300)
    assert not errors
    final = ManifestTable(spark, str(tmp_path / "cm"), fs=sink_fs)
    rows = {(r["k"], r["v"]) for r in final.read().select("k", "v").collect()}
    # BOTH upserts applied, untouched d2 row intact
    assert rows == {(1, "a2"), (2, "b2"), (3, "c")}


def test_fencing_stalled_winner_write_is_invisible(tmp_path):
    """THE fencing-token scenario (the documented TTL-steal hole, now
    closed): winner A writes its fence file then stalls past the TTL;
    thief B steals the claim — the token bumps — and commits.  A's
    resume must abort at the token check, its bytes never become
    visible, and no stale fence file survives."""
    import os

    from verified_sources_spark.operators.fs import (
        InProcessCoordinator,
        LocalFS,
        LockTableCommitBackend,
    )

    t = [0.0]
    coord = InProcessCoordinator(ttl_s=60.0, clock=lambda: t[0])
    fs = LocalFS()
    p = str(tmp_path / "v2.json")
    thief = LockTableCommitBackend(coord, fs, owner="B")

    def stall():
        t[0] = 61.0                      # A's lease expires mid-stall
        thief.put_if_absent(p, "THIEF")  # B steals the claim and commits

    stale = LockTableCommitBackend(coord, fs, owner="A", _stall_hook=stall)
    with pytest.raises(FileExistsError):
        stale.put_if_absent(p, "STALE")
    assert fs.read_text(p) == "THIEF"
    assert [n for n in os.listdir(tmp_path) if ".fence." in n] == []
    # the thief's token is strictly newer than the stalled winner's
    assert coord.current(p) == ("B", 2)


def test_promote_exclusive_never_overwrites(tmp_path):
    """The storage half of fencing: promotion is atomic-no-overwrite, so
    even a writer that passed the token check a microsecond before the
    steal cannot clobber an already-promoted manifest."""
    from verified_sources_spark.operators.fs import LocalFS

    fs = LocalFS()
    s1, s2, dst = (str(tmp_path / n) for n in ("s1", "s2", "dst"))
    fs.write_text(s1, "one")
    fs.write_text(s2, "two")
    fs.promote_exclusive(s1, dst)
    assert fs.read_text(dst) == "one" and not fs.exists(s1)
    with pytest.raises(FileExistsError):
        fs.promote_exclusive(s2, dst)
    assert fs.read_text(dst) == "one"  # loser's content stayed invisible


# ---------------------------------------------------- metadata-only aggregates
def test_stats_aggregate_answers_without_touching_data(spark, tmp_path):
    """count(*)/min/max served from manifest metadata alone: exact
    against a real scan, and provably scan-free — the answer survives
    the data bytes being truncated out from under the table."""
    import datetime

    from verified_sources_spark.operators.table_format import StatsNotServable

    t = ManifestTable(spark, str(tmp_path / "agg"), partition_by=["g"])
    rows = [
        (i, "g%d" % (i % 3), float(i) * 1.5, datetime.date(2024, 1, 1 + i % 20),
         "s%d" % i)
        for i in range(50)
    ]
    t.append(
        spark.createDataFrame(
            rows, "id long, g string, val double, d date, s string"
        ).repartition(4)
    )
    got = t.stats_aggregate(
        {"n": ("count", "*"), "lo": ("min", "id"), "hi": ("max", "id"),
         "vmax": ("max", "val"), "dmin": ("min", "d")}
    )
    import pyspark.sql.functions as F

    want = t.read().agg(
        F.count(F.lit(1)).alias("n"), F.min("id").alias("lo"),
        F.max("id").alias("hi"), F.max("val").alias("vmax"),
        F.min("d").alias("dmin"),
    ).first().asDict()
    assert got == want

    # partition-equality scoping is exact
    assert t.stats_aggregate({"n": ("count", "*")}, where=[("g", "=", "g0")]) == {
        "n": sum(1 for r in rows if r[1] == "g0")
    }
    assert t.stats_aggregate(
        {"n": ("count", "*")}, where=[("g", "in", ["g1", "g2"])]
    ) == {"n": sum(1 for r in rows if r[1] in ("g1", "g2"))}

    # refusals are loud: string min/max (footer truncation), non-partition
    # predicates, per-column counts
    for bad_aggs, bad_where in [
        ({"x": ("min", "s")}, None),
        ({"n": ("count", "*")}, [("id", ">", 5)]),
        ({"n": ("count", "id")}, None),
    ]:
        with pytest.raises(StatsNotServable):
            t.stats_aggregate(bad_aggs, where=bad_where)

    # provably metadata-only: truncate every data file — the stats answer
    # is unchanged while a real scan would now fail
    for dirpath, _dirs, files in os.walk(str(tmp_path / "agg" / "data")):
        for f in files:
            if f.endswith(".parquet"):
                open(os.path.join(dirpath, f), "wb").close()
    assert t.stats_aggregate({"n": ("count", "*"), "hi": ("max", "id")}) == {
        "n": 50, "hi": 49,
    }


def test_aggregate_falls_back_and_dv_semantics(spark, tmp_path):
    """aggregate() serves from metadata when exact and silently runs the
    one pruned scan otherwise; deletion vectors keep count(*) exact but
    refuse min/max (the DV may mask the extremal row)."""
    from verified_sources_spark.operators.table_format import StatsNotServable

    t = ManifestTable(spark, str(tmp_path / "aggdv"))
    t.append(
        spark.createDataFrame(
            [(i, "s%d" % i) for i in range(30)], "id long, s string"
        ).repartition(3)
    )
    t.delete_where("id < 5")
    assert t.stats_aggregate({"n": ("count", "*")}) == {"n": 25}
    with pytest.raises(StatsNotServable):
        t.stats_aggregate({"lo": ("min", "id")})
    # fallback path computes the exact post-DV extrema and string min
    assert t.aggregate({"lo": ("min", "id"), "smin": ("min", "s")}) == {
        "lo": 5, "smin": "s10",
    }
    # time travel: the pre-delete snapshot still serves from metadata
    assert t.stats_aggregate({"n": ("count", "*"), "lo": ("min", "id")},
                             version=1) == {"n": 30, "lo": 0}


def test_compact_zorder_multidimensional_skipping(spark, tmp_path):
    """layout='zorder' trades a little single-column precision for
    useful min/max tightness on EVERY clustered dimension: a linear
    (x, y) sort skips surgically on x but touches every file for a
    y-predicate; Z-order skips on both.  Row content is untouched."""
    import random

    t = ManifestTable(spark, str(tmp_path / "zo"))
    random.seed(7)
    rows = [(i, random.randrange(10000), random.randrange(10000))
            for i in range(40000)]
    t.append(spark.createDataFrame(rows, "id long, x long, y long").repartition(16))

    def touched(filters):
        return len(t.candidate_entries(filters, None))

    t.compact(target_file_bytes=60_000, cluster_by=["x", "y"])
    n_linear = len(t._manifest(t.latest_version())["files"])
    assert touched([("x", "<", 500)]) <= 2          # surgical on the lead col
    assert touched([("y", "<", 500)]) == n_linear   # blind on the second

    # finer-grained than the linear pass: with only ~8 files a z-curve
    # chunk can straddle quadrant boundaries and the file count itself
    # sits on a ceil(total/target) boundary (parquet sizes wobble a
    # little run-to-run), which made an == threshold flaky under load
    t.compact(target_file_bytes=25_000, cluster_by=["x", "y"], layout="zorder")
    n_z = len(t._manifest(t.latest_version())["files"])
    zx, zy = touched([("x", "<", 500)]), touched([("y", "<", 500)])
    assert zx < n_z and zy < n_z  # useful skipping on BOTH dimensions
    # physical-only: the scan result is exact either way
    got = {r.id for r in t.scan([("x", "<", 500)]).collect()}
    assert got == {r[0] for r in rows if r[1] < 500}


def test_compact_zorder_validation_and_types(spark, tmp_path):
    import datetime

    t = ManifestTable(spark, str(tmp_path / "zov"))
    t.append(
        spark.createDataFrame(
            [(i, "s%d" % i, datetime.date(2024, 1, 1 + i % 28), i * 1.5)
             for i in range(2000)],
            "id long, s string, d date, v double",
        ).repartition(8)
    )
    with pytest.raises(ValueError, match="zorder"):
        t.compact(cluster_by=["id"], layout="zorder")  # needs 2+ cols
    with pytest.raises(ValueError, match="layout"):
        t.compact(layout="bogus")
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        t.compact(cluster_by=["s", "id"], layout="zorder")
    # date + double columns z-order fine and rows survive exactly
    v = t.compact(target_file_bytes=20_000, cluster_by=["d", "v"],
                  layout="zorder")
    assert v is not None
    assert t.read().count() == 2000
    assert {r.id for r in t.scan([("v", "<", 100.0)]).collect()} == set(range(67))
