"""Transaction-logged parquet tables (sources/tlog.py): versioned
commits, file-granular CoW merge, time travel, optimistic concurrency,
vacuum — the reference's WAL+snapshot durability surface
(lib/src/durability/wal.rs:37-108, snapshot.rs:33-62) rebuilt as a
Delta-style log over plain parquet."""

import os

import pytest

from graphdb_spark.sources import tlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, name string")


def _names(df):
    return {(r["id"], r["name"]) for r in df.collect()}


BASE = [(i, f"n{i}") for i in range(10)]


def test_create_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    v = tlog.create(_df(spark, BASE), p, keys=["id"])
    assert v == 1
    assert _names(tlog.read(spark, p)) == set(BASE)
    assert tlog.table_keys(p) == ["id"]
    with pytest.raises(FileExistsError):
        tlog.create(_df(spark, BASE), p)


def test_append_history_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    v = tlog.append(_df(spark, [(100, "x"), (101, "y")]), p)
    assert v == 2
    assert _names(tlog.read(spark, p)) == set(BASE) | {(100, "x"), (101, "y")}
    # version 1 still serves the pre-append state
    assert _names(tlog.read(spark, p, version=1)) == set(BASE)
    ops = [h["op"] for h in tlog.history(p)]
    assert ops == ["create", "append"]


def test_overwrite_keeps_history(spark, tmp_path):
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    tlog.overwrite(_df(spark, [(1, "only")]), p)
    assert _names(tlog.read(spark, p)) == {(1, "only")}
    assert _names(tlog.read(spark, p, version=1)) == set(BASE)
    with pytest.raises(tlog.NoSuchVersion):
        tlog.read(spark, p, version=9)


def _ranged_table(spark, p, n=100, files=4):
    """n rows written as ``files`` range-partitioned files, so footer
    min/max stats give disjoint id ranges per file."""
    df = (
        spark.createDataFrame([(i, f"n{i}") for i in range(n)],
                              "id int, name string")
        .repartitionByRange(files, "id")
        .sortWithinPartitions("id")
    )
    tlog.create(df, p, keys=["id"])
    return {(i, f"n{i}") for i in range(n)}


def test_merge_updates_and_inserts(spark, tmp_path):
    p = str(tmp_path / "t")
    rows = _ranged_table(spark, p)
    tlog.merge(spark, p, _df(spark, [(5, "FIVE"), (1000, "NEW")]))
    want = {r for r in rows if r[0] != 5} | {(5, "FIVE"), (1000, "NEW")}
    assert _names(tlog.read(spark, p)) == want
    # pre-merge version intact
    assert _names(tlog.read(spark, p, version=1)) == rows


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    p = str(tmp_path / "t")
    _ranged_table(spark, p, n=100, files=4)
    v1 = tlog._snapshot(p)
    assert len(v1["files"]) == 4
    # ids 1..3 live in exactly one range file
    tlog.merge(spark, p, _df(spark, [(1, "A"), (2, "B"), (3, "C")]))
    v2 = tlog._snapshot(p)
    assert len(v2["remove"]) == 1, v2["remove"]
    # the three untouched files carry over BY REFERENCE (same paths)
    carried = set(v1["files"]) & set(v2["files"])
    assert len(carried) == 3
    for rf in carried:
        assert os.path.exists(os.path.join(p, rf))


def test_merge_insert_only_rewrites_nothing(spark, tmp_path):
    p = str(tmp_path / "t")
    rows = _ranged_table(spark, p, n=100, files=4)
    v1 = tlog._snapshot(p)
    tlog.merge(spark, p, _df(spark, [(5000, "far"), (5001, "away")]))
    v2 = tlog._snapshot(p)
    assert v2["remove"] == []
    assert set(v1["files"]) <= set(v2["files"])
    assert _names(tlog.read(spark, p)) == rows | {(5000, "far"),
                                                  (5001, "away")}


def test_merge_null_key_rows_insert(spark, tmp_path):
    """Null-key update rows can never equi-match; they insert — the
    same semantics as delta_store's parquet-mode anti-join merge."""
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    tlog.merge(spark, p, _df(spark, [(5, "FIVE"), (None, "ghost")]))
    got = _names(tlog.read(spark, p))
    assert (5, "FIVE") in got and (None, "ghost") in got
    assert (5, "n5") not in got and len(got) == len(BASE) + 1


def test_delete_cow_and_noop(spark, tmp_path):
    p = str(tmp_path / "t")
    rows = _ranged_table(spark, p, n=100, files=4)
    v1 = tlog._snapshot(p)
    tlog.delete(spark, p, _df(spark, [(1, None), (2, None)]))
    v2 = tlog._snapshot(p)
    assert len(v2["remove"]) == 1  # one file held ids 1..2
    assert len(set(v1["files"]) & set(v2["files"])) == 3
    assert _names(tlog.read(spark, p)) == {
        r for r in rows if r[0] not in (1, 2)
    }
    # delete with no matches: version advances, files unchanged
    tlog.delete(spark, p, _df(spark, [(7777, None)]))
    v3 = tlog._snapshot(p)
    assert v3["version"] == 3 and set(v3["files"]) == set(v2["files"])


def test_delete_all_leaves_readable_empty_table(spark, tmp_path):
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    tlog.delete(spark, p, _df(spark, BASE))
    got = tlog.read(spark, p)
    assert got.count() == 0
    assert got.columns == ["id", "name"]


def test_conflict_retry_rebases_on_winner(spark, tmp_path, monkeypatch):
    """A rival lands version 2 between our snapshot read and commit:
    the link CAS fails, the loser re-reads and lands version 3 with
    BOTH writers' rows — no lost update."""
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    orig = tlog._try_commit
    state = {"raced": False}

    def race(path, record):
        if not state["raced"]:
            state["raced"] = True
            prev = tlog._snapshot(path)
            rival_files = tlog._write_data(
                _df(spark, [(200, "rival")]), path
            )
            orig(path, {
                "version": prev["version"] + 1, "op": "append",
                "ts": 0.0, "keys": prev["keys"],
                "schema": prev["schema"],
                "files": prev["files"] + rival_files,
                "add": rival_files, "remove": [], "stats": {},
            })
        return orig(path, record)

    monkeypatch.setattr(tlog, "_try_commit", race)
    v = tlog.append(_df(spark, [(300, "mine")]), p)
    assert v == 3
    got = _names(tlog.read(spark, p))
    assert (200, "rival") in got and (300, "mine") in got


def test_tmp_and_junk_files_invisible(spark, tmp_path):
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    log = os.path.join(p, tlog.LOG_DIR)
    # a crashed writer's half-written tmp commit + unrelated junk
    with open(os.path.join(log, ".tmp-deadbeef"), "w") as f:
        f.write('{"version": 99')
    with open(os.path.join(log, "notes.txt.json"), "w") as f:
        f.write("junk")
    assert tlog.latest_version(p) == 1
    assert _names(tlog.read(spark, p)) == set(BASE)


def test_vacuum_drops_history_and_orphans(spark, tmp_path):
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    tlog.overwrite(_df(spark, [(1, "v2")]), p)
    tlog.overwrite(_df(spark, [(1, "v3")]), p)
    # orphan from a crashed writer (never referenced by any commit)
    orphan = tlog._write_data(_df(spark, [(9, "zz")]), p)
    res = tlog.vacuum(p, retain_versions=1, orphan_age_s=0.0)
    assert res["commits_removed"] == 2
    assert _names(tlog.read(spark, p)) == {(1, "v3")}
    for rf in orphan:
        assert not os.path.exists(os.path.join(p, rf))
    with pytest.raises(tlog.NoSuchVersion):
        tlog.read(spark, p, version=1)
    # retained data still on disk, old data files gone
    live = tlog._snapshot(p)["files"]
    for rf in live:
        assert os.path.exists(os.path.join(p, rf))


def test_compact_preserves_content_and_history(spark, tmp_path):
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    for i in range(3):
        tlog.append(_df(spark, [(50 + i, f"a{i}")]), p)
    before = _names(tlog.read(spark, p))
    pre_files = len(tlog._snapshot(p)["files"])
    tlog.compact(spark, p)
    post = tlog._snapshot(p)
    assert len(post["files"]) < pre_files
    assert _names(tlog.read(spark, p)) == before
    assert _names(tlog.read(spark, p, version=4)) == before


def test_append_schema_mismatch_raises(spark, tmp_path):
    """Schema-on-write: a narrower append must refuse, not silently
    rewrite the committed schema (which would drop the column from
    every future read)."""
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    with pytest.raises(ValueError, match="schema mismatch"):
        tlog.append(spark.createDataFrame([(7,)], "id int"), p)
    with pytest.raises(ValueError, match="schema mismatch"):
        tlog.merge(spark, p, spark.createDataFrame(
            [(7, "x", 1)], "id int, name string, extra int"))
    # column ORDER may differ; it is normalized to the table's
    tlog.append(
        spark.createDataFrame([("z", 500)], "name string, id int")
        .select("name", "id"), p,
    )
    assert (500, "z") in _names(tlog.read(spark, p))


def test_append_survives_create_race(spark, tmp_path, monkeypatch):
    """exists() says no table, but a rival creates before our create
    lands: the FileExistsError reroutes into a real append instead of
    surfacing to the caller."""
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    state = {"first": True}
    orig = tlog.exists

    def stale_exists(path):
        if state["first"]:
            state["first"] = False
            return False  # the snapshot this writer raced from
        return orig(path)

    monkeypatch.setattr(tlog, "exists", stale_exists)
    v = tlog.append(_df(spark, [(900, "late")]), p)
    assert v == 2
    got = _names(tlog.read(spark, p))
    assert (900, "late") in got and set(BASE) <= got


def test_vacuum_spares_live_writer_staging_dir(spark, tmp_path):
    """A concurrent df.write stages under _temporary/ with no .parquet
    visible yet — vacuum must not rmtree a fresh staging dir (files
    are age-gated; the dir removal must be too)."""
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    staging = os.path.join(p, "dlivewriter")
    os.makedirs(os.path.join(staging, "_temporary"))
    with open(os.path.join(staging, "_temporary", "task-0"), "w") as f:
        f.write("inflight")
    tlog.vacuum(p, retain_versions=1, orphan_age_s=3600.0)
    assert os.path.isdir(staging)  # fresh: spared
    tlog.vacuum(p, retain_versions=1, orphan_age_s=0.0)
    assert not os.path.isdir(staging)  # abandoned: reclaimed


def test_txn_idempotent_append_and_merge(spark, tmp_path):
    """txn=(app, epoch) is Delta's txnAppId/txnVersion: a replayed
    epoch commits nothing, a newer one commits, apps are independent."""
    p = str(tmp_path / "t")
    tlog.create(_df(spark, BASE), p, keys=["id"])
    v = tlog.append(_df(spark, [(100, "x")]), p, txn=("ingest", 0))
    assert v == 2
    # exact replay: version unchanged, row NOT duplicated
    assert tlog.append(_df(spark, [(100, "x")]), p,
                       txn=("ingest", 0)) == 2
    assert tlog.read(spark, p).count() == len(BASE) + 1
    assert tlog.append(_df(spark, [(101, "y")]), p,
                       txn=("ingest", 1)) == 3
    v_m = tlog.merge(spark, p, _df(spark, [(0, "Z")]), txn=("cdc", 5))
    assert tlog.merge(spark, p, _df(spark, [(0, "WRONG")]),
                      txn=("cdc", 5)) == v_m
    got = _names(tlog.read(spark, p))
    assert (0, "Z") in got and (0, "WRONG") not in got
    # a different app's epoch space is independent
    assert tlog.append(_df(spark, [(102, "w")]), p,
                       txn=("other", 0)) > v_m
    # watermarks survive vacuum (carried forward per commit)
    tlog.vacuum(p, retain_versions=1, orphan_age_s=0.0)
    assert tlog.append(_df(spark, [(103, "zz")]), p,
                       txn=("ingest", 1)) == tlog.latest_version(p)
    assert (103, "zz") not in _names(tlog.read(spark, p))


def test_write_stream_exactly_once(spark, tmp_path):
    """Structured Streaming sink: the checkpoint delivers
    at-least-once; the txn watermark de-duplicates to exactly-once."""
    src = str(tmp_path / "src")
    _df(spark, [(1, "a"), (2, "b")]).coalesce(1).write.mode(
        "overwrite").parquet(src)

    def stream():
        return (spark.readStream.schema("id int, name string")
                .parquet(src))

    tbl, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    q = tlog.write_stream(stream(), tbl, ckpt, app="s1")
    q.awaitTermination(120)
    assert _names(tlog.read(spark, tbl)) == {(1, "a"), (2, "b")}
    n_commits = len(tlog.history(tbl))
    # restart from the same checkpoint with no new data: no commits
    q2 = tlog.write_stream(stream(), tbl, ckpt, app="s1")
    q2.awaitTermination(120)
    assert len(tlog.history(tbl)) == n_commits
    # a crashed-sink replay of batch 0 is a no-op, not a double-append
    tlog.append(_df(spark, [(1, "dup")]), tbl, txn=("s1", 0))
    assert tlog.read(spark, tbl).count() == 2


def test_graphsession_save_load_tlog(spark, tmp_path):
    """GraphSession.save/load route fmt='tlog' through the log — the
    persisted graph is versioned (time-travel-able), not bare files."""
    from graphdb_spark.session import GraphSession
    from graphdb_spark.sources import delta_store as DS

    v = spark.createDataFrame([("a", "person"), ("b", "person")],
                              "id string, label string")
    e = spark.createDataFrame([("a", "KNOWS", "b")],
                              "src string, relationship string, dst string")
    g = GraphSession(spark, v, e)
    vp, ep = str(tmp_path / "v"), str(tmp_path / "e")
    g.save(vp, ep, fmt="tlog")
    g2 = GraphSession.load(spark, vp, ep, fmt="tlog")
    assert g2.vertex_count() == 2 and g2.edge_count() == 1
    g.save(vp, ep, fmt="tlog")  # version 2
    assert DS.load_table_version(spark, vp, 1, fmt="tlog").count() == 2


def test_delta_store_tlog_mode(spark, tmp_path):
    """delta_store routes fmt='tlog' through the log: MERGE semantics
    identical to the parquet path, plus working time travel."""
    from graphdb_spark.sources import delta_store as DS

    p = str(tmp_path / "t")
    assert DS.save_table(_df(spark, BASE), p, fmt="tlog") == "tlog"
    DS.merge_table(spark, p, _df(spark, [(0, "zero2"), (42, "ans")]),
                   ["id"], fmt="tlog")
    got = _names(DS.load_table(spark, p, fmt="tlog"))
    assert (0, "zero2") in got and (42, "ans") in got and (0, "n0") not in got
    # versionAsOf on plain parquet — impossible before tlog
    v1 = DS.load_table_version(spark, p, 1, fmt="tlog")
    assert _names(v1) == set(BASE)
    DS.delete_from_table(spark, p, _df(spark, [(42, None)]), ["id"],
                         fmt="tlog")
    assert (42, "ans") not in _names(DS.load_table(spark, p, fmt="tlog"))
