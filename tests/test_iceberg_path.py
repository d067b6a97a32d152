"""Iceberg-path Catalog behavior under mocked Spark surfaces.

No iceberg-spark-runtime jar exists offline (SURVEY.md §7 [ENV]), so these
tests pin the CONTRACT of the Iceberg code path — which public surfaces it
calls and with what arguments — against lightweight fakes:

* `append` must thread the crash-reconciliation tag into the
  `snapshot-property.tilers.tag` write option (the public Iceberg
  spark-writes mechanism for stamping snapshot summary properties);
* `rollback_where` must scan the current-ancestor chain newest-first,
  roll back past a contiguous matching tip suffix with exactly one
  `system.rollback_to_snapshot` call, and refuse (raise) on non-tip
  matches or a fully-matching history.

The behavioral spec for WHAT reconciliation must achieve is the parquet
fallback's crash-injection test (tests/test_resume.py) — these tests pin
that the Iceberg path drives the equivalent snapshot operations.
"""

from __future__ import annotations

import json

import pytest

from tilers_tools_spark.sources.catalog import _SNAP_PROP_PREFIX, _TAG_PROP, Catalog

# ---------------------------------------------------------------- fakes


class FakeWriter:
    def __init__(self, log):
        self.log = log
        self.options = {}

    def option(self, k, v):
        self.options[k] = v
        return self

    def append(self):
        self.log.append(("append", dict(self.options)))

    def create(self):
        self.log.append(("create", dict(self.options)))


class FakeDF:
    def __init__(self, log):
        self._log = log

    def writeTo(self, table):
        self._log.append(("writeTo", table))
        return FakeWriter(self._log)


class FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class FakeCatalogAPI:
    def __init__(self, exists=True, current="spark_catalog"):
        self._exists = exists
        self._current = current

    def tableExists(self, table):
        return self._exists

    def currentCatalog(self):
        return self._current


class FakeSpark:
    """Answers the metadata-chain SELECT with canned rows and records every
    other statement (the CALL)."""

    def __init__(self, chain_rows, exists=True, current="spark_catalog"):
        self.chain_rows = chain_rows
        self.catalog = FakeCatalogAPI(exists, current)
        self.statements = []

    def sql(self, stmt):
        if stmt.lstrip().upper().startswith("SELECT"):
            self.statements.append(("select", stmt))
            return FakeResult(self.chain_rows)
        self.statements.append(("other", stmt))
        return FakeResult([])


def snap(sid, tag, parent=None):
    """A fake joined history×snapshots row. The implementation walks the
    parent chain itself (made_current_at is not a reliable order key), so
    the fakes carry parent_id and may be given in any order."""
    summary = {} if tag is None else {_TAG_PROP: json.dumps(tag, sort_keys=True)}
    return {"snapshot_id": sid, "parent_id": parent, "summary": summary}


# ---------------------------------------------------------------- append


def test_append_stamps_tag_as_snapshot_property(tmp_path):
    log = []
    cat = Catalog(FakeSpark([], exists=True), str(tmp_path), use_iceberg=True)
    cat.append(FakeDF(log), "db.tiles", tag={"run_id": "r1", "part_id": 3})
    assert log[0] == ("writeTo", "db.tiles")
    verb, opts = log[1]
    assert verb == "append"
    assert opts[_SNAP_PROP_PREFIX + _TAG_PROP] == json.dumps(
        {"part_id": 3, "run_id": "r1"}, sort_keys=True
    )


def test_append_create_path_and_tagless(tmp_path):
    log = []
    cat = Catalog(FakeSpark([], exists=False), str(tmp_path), use_iceberg=True)
    cat.append(FakeDF(log), "db.tiles", tag=None)
    verb, opts = log[1]
    assert verb == "create"
    assert opts == {}  # no tag -> no snapshot-property option


# ---------------------------------------------------------- rollback_where


def test_rollback_tip_suffix_single_call(tmp_path):
    # chain newest-first: two orphans from run r9 at the tip, then good ones
    spark = FakeSpark(
        [
            snap(30, {"run_id": "r9", "part_id": 1}, parent=20),
            snap(40, {"run_id": "r9", "part_id": 2}, parent=30),
            snap(10, None),
            snap(20, {"run_id": "r1", "part_id": 1}, parent=10),
        ]
    )
    cat = Catalog(spark, str(tmp_path), use_iceberg=True)
    n = cat.rollback_where("db.tiles", lambda t: t.get("run_id") == "r9")
    assert n == 2
    calls = [s for kind, s in spark.statements if kind == "other"]
    assert calls == ["CALL spark_catalog.system.rollback_to_snapshot('db.tiles', 20)"]


def test_rollback_explicit_catalog_identifier(tmp_path):
    spark = FakeSpark([snap(2, {"run_id": "x"}, parent=1), snap(1, None)])
    cat = Catalog(spark, str(tmp_path), use_iceberg=True)
    n = cat.rollback_where("prod.db.tiles", lambda t: True)
    assert n == 1
    calls = [s for kind, s in spark.statements if kind == "other"]
    # 3-part identifier: procedure runs under its catalog with a
    # catalog-relative table name
    assert calls == ["CALL prod.system.rollback_to_snapshot('db.tiles', 1)"]
    # and the metadata scan hit the history/snapshots tables of the table
    sel = [s for kind, s in spark.statements if kind == "select"][0]
    assert "prod.db.tiles.history" in sel and "prod.db.tiles.snapshots" in sel
    assert "is_current_ancestor" in sel and "parent_id" in sel


def test_rollback_no_match_is_noop(tmp_path):
    spark = FakeSpark([snap(2, {"run_id": "r1"}, parent=1), snap(1, None)])
    cat = Catalog(spark, str(tmp_path), use_iceberg=True)
    assert cat.rollback_where("db.tiles", lambda t: t.get("run_id") == "nope") == 0
    assert [s for kind, s in spark.statements if kind == "other"] == []


def test_rollback_non_tip_match_raises(tmp_path):
    # a matching snapshot buried below a non-matching one: the engine's
    # crash model can't produce this — refuse to rewrite non-tip history
    spark = FakeSpark(
        [
            snap(30, {"run_id": "good"}, parent=20),
            snap(20, {"run_id": "orphan"}, parent=10),
            snap(10, None),
        ]
    )
    cat = Catalog(spark, str(tmp_path), use_iceberg=True)
    with pytest.raises(RuntimeError, match="not part of the tip suffix"):
        cat.rollback_where("db.tiles", lambda t: t.get("run_id") == "orphan")
    assert [s for kind, s in spark.statements if kind == "other"] == []


def test_rollback_entire_history_matching_raises(tmp_path):
    spark = FakeSpark([snap(2, {"run_id": "r"}, parent=1), snap(1, {"run_id": "r"})])
    cat = Catalog(spark, str(tmp_path), use_iceberg=True)
    with pytest.raises(RuntimeError, match="empty table"):
        cat.rollback_where("db.tiles", lambda t: True)
    assert [s for kind, s in spark.statements if kind == "other"] == []


def test_rollback_untagged_tip_blocks_suffix(tmp_path):
    # an untagged snapshot at the tip (foreign writer) means the orphans
    # are NOT a tip suffix -> the non-tip guard must trip, not roll back
    spark = FakeSpark(
        [
            snap(30, None, parent=20),
            snap(20, {"run_id": "orphan"}, parent=10),
            snap(10, None),
        ]
    )
    cat = Catalog(spark, str(tmp_path), use_iceberg=True)
    with pytest.raises(RuntimeError, match="not part of the tip suffix"):
        cat.rollback_where("db.tiles", lambda t: t.get("run_id") == "orphan")


def test_rollback_duplicate_history_rows_and_ties(tmp_path):
    """A snapshot re-made-current by a prior rollback appears TWICE in
    <table>.history; the parent-chain walk must dedupe and still find the
    tip suffix (timestamp ordering would misorder/duplicate these)."""
    spark = FakeSpark(
        [
            snap(20, {"run_id": "orphan"}, parent=10),
            snap(10, None),
            snap(10, None),  # duplicate history row for the same snapshot
        ]
    )
    cat = Catalog(spark, str(tmp_path), use_iceberg=True)
    assert cat.rollback_where("db.tiles", lambda t: t.get("run_id") == "orphan") == 1
    calls = [s for kind, s in spark.statements if kind == "other"]
    assert calls == ["CALL spark_catalog.system.rollback_to_snapshot('db.tiles', 10)"]


def test_rollback_broken_chain_raises(tmp_path):
    """Two tip candidates (disconnected chain) must refuse, not guess."""
    spark = FakeSpark([snap(2, {"run_id": "r"}), snap(1, None)])  # no parent links
    cat = Catalog(spark, str(tmp_path), use_iceberg=True)
    with pytest.raises(RuntimeError, match="unique tip"):
        cat.rollback_where("db.tiles", lambda t: True)
