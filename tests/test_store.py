"""Store contract tests (etl_ai_assistent_spark/store.py): content
fingerprinting, atomic publish, race-loser adoption, damaged-store
rebuild — the r9 verdict #2 hardening."""

from __future__ import annotations

import os
import threading

import duckdb
import pytest

from etl_ai_assistent_spark import store


def _write_docs(path: str, texts: list[str]) -> None:
    duckdb.sql(
        "COPY (SELECT row_number() OVER () - 1 AS doc_id, t AS text"
        "      FROM (SELECT unnest(?) AS t)) TO '" + path + "'"
        " (FORMAT PARQUET)",
        params=[texts],
    )


def test_fingerprint_changes_on_content_edit_same_rowcount(tmp_path):
    """The r9 finding: a corpus whose text changes but whose row count
    doesn't must get a fresh store. The footer fingerprint (stats +
    sizes) must move when one document's text mutates."""
    p = str(tmp_path / "documents.parquet")
    _write_docs(p, ["alpha document", "beta document", "gamma document"])
    fp1 = store.table_fingerprint(p)
    _write_docs(p, ["alpha document", "CHANGED document", "gamma document"])
    fp2 = store.table_fingerprint(p)
    assert fp1 != fp2
    # row count is identical — the old (tag, count) key would collide
    [(n1,)] = duckdb.sql(
        "SELECT count(*) FROM read_parquet(?)", params=[p]
    ).fetchall()
    assert n1 == 3


def test_fingerprint_stable_on_rewrite(tmp_path):
    """Same content written twice → same fingerprint (the key must not
    churn on a byte-identical regeneration)."""
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    _write_docs(p1, ["one", "two"])
    _write_docs(p2, ["one", "two"])
    assert store.table_fingerprint(p1) == store.table_fingerprint(p2)


def test_corpus_key_components(tmp_path):
    sf = tmp_path / "sf0.5x"
    sf.mkdir()
    _write_docs(str(sf / "documents.parquet"), ["x", "y", "z"])
    tag, n, fp = store.corpus_key(str(sf), "documents")
    assert tag == "sf0_5x"
    assert n == 3
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)


def test_publish_builds_then_adopts(tmp_path):
    final = str(tmp_path / "root" / "art_v1")
    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(tmp)
        open(os.path.join(tmp, "data.txt"), "w").write("built")

    assert store.publish(final, build) is False  # built
    assert store.publish(final, build) is True  # adopted
    assert len(calls) == 1
    assert open(os.path.join(final, "data.txt")).read() == "built"
    # the temp build dir is gone
    assert os.listdir(os.path.dirname(final)) == ["art_v1"]


def test_publish_race_loser_adopts_winner(tmp_path):
    """Two builders racing the same path: one rename wins, the loser
    discards its temp and serves the winner's artifact — no torn
    state, no exception."""
    final = str(tmp_path / "art")
    gate = threading.Barrier(2)
    results = {}

    def build(tag):
        def _b(tmp):
            os.makedirs(tmp)
            open(os.path.join(tmp, "who.txt"), "w").write(tag)
            gate.wait()  # both finish building before either renames

        return _b

    def run(tag):
        results[tag] = store.publish(final, build(tag))

    t1 = threading.Thread(target=run, args=("a",))
    t2 = threading.Thread(target=run, args=("b",))
    t1.start(), t2.start()
    t1.join(), t2.join()
    # exactly one built (False), the other adopted (True)
    assert sorted(results.values()) == [False, True]
    assert open(os.path.join(final, "who.txt")).read() in ("a", "b")
    assert os.listdir(os.path.dirname(final)) == ["art"]


def test_publish_rebuilds_damaged_store(tmp_path):
    """A published store that fails validation (tmp-cleaner damage,
    pre-planted bogus artifact) is torn down and rebuilt, not served."""
    final = str(tmp_path / "art")
    os.makedirs(final)  # bogus: no marker file

    def build(tmp):
        os.makedirs(tmp)
        open(os.path.join(tmp, "_MARKER"), "w").write("ok")

    valid = lambda p: os.path.exists(os.path.join(p, "_MARKER"))
    assert store.publish(final, build, validate=valid) is False  # rebuilt
    assert valid(final)
    assert store.publish(final, build, validate=valid) is True


def test_store_root_env(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_STORE_ROOT", str(tmp_path))
    assert store.store_root() == str(tmp_path)
    monkeypatch.delenv("SPARK_GRAFT_STORE_ROOT")
    assert store.store_root() == "/tmp"


def test_parquet_rows(tmp_path):
    d = tmp_path / "pub"
    d.mkdir()
    _write_docs(str(d / "part-0.parquet"), ["a", "b"])
    _write_docs(str(d / "part-1.parquet"), ["c"])
    assert store.parquet_rows(str(d)) == 3


def test_gc_versions_keeps_live_removes_stale(tmp_path):
    """Retention sweep: stale version dirs go, live keys stay, fresh
    builder temps stay (they may be a racing build), crashed old temps
    go — and files (markers, etc.) at the family root are untouched."""
    import os
    import time as _t

    from etl_ai_assistent_spark import store as ST

    fam = tmp_path / "spark_graft_demo_store_v1"
    for name in ("sf_a_10_aaa", "sf_a_10_bbb", "sf_b_20_ccc"):
        (fam / name).mkdir(parents=True)
        (fam / name / "_SUCCESS").write_text("")
    (fam / "sf_a_10_aaa.build-1-dead").mkdir()
    (fam / "sf_a_10_bbb.build-2-live").mkdir()
    (fam / "notes.txt").write_text("keep me")
    now = _t.time()
    os.utime(fam / "sf_a_10_aaa.build-1-dead", (now - 7200, now - 7200))

    removed = ST.gc_versions(str(fam), keep={"sf_a_10_bbb", "sf_b_20_ccc"})
    assert sorted(removed) == ["sf_a_10_aaa", "sf_a_10_aaa.build-1-dead"]
    assert sorted(os.listdir(fam)) == [
        "notes.txt",
        "sf_a_10_bbb",
        "sf_a_10_bbb.build-2-live",
        "sf_b_20_ccc",
    ]


def test_gc_versions_missing_root_is_noop(tmp_path):
    from etl_ai_assistent_spark import store as ST

    assert ST.gc_versions(str(tmp_path / "absent"), keep=()) == []
