"""End-to-end converter orchestration (REF/Converter.java:69-83,
REF/data/DataCopier.java:45-138): existence intersection → DDL → delete
probe → copy, across the ConvertMode matrix."""

from __future__ import annotations

import pytest

from spanner_jdbc_converter_spark.catalog import load_table
from spanner_jdbc_converter_spark.converter import convert_all
from spanner_jdbc_converter_spark.copy import TableExistsError
from spanner_jdbc_converter_spark.modes import ConvertMode

TABLES = ["region", "nation"]


def _counts(spark, sf_dir):
    return {t: load_table(spark, sf_dir, t).count() for t in TABLES}


def test_fresh_destination_creates_and_copies(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "dest")
    reports = convert_all(spark, sf_dir, dest, TABLES)
    assert [r.table for r in reports] == TABLES
    src_counts = _counts(spark, sf_dir)
    for r in reports:
        assert r.ddl_action == "created"
        assert r.ddl and r.ddl[0].startswith(f"CREATE TABLE {r.table} (")
        assert "PRIMARY KEY" in r.ddl[0]
        assert r.data_action == "copied"
        assert r.result.record_count == src_counts[r.table]
        assert r.result.byte_count > 0
        assert r.result.seconds >= 0
    # destination tree is loadable with the standard loader
    for t in TABLES:
        assert spark.read.parquet(f"{dest}/{t}.parquet").count() == src_counts[t]


def test_existence_intersection_filters_unknown_tables(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "dest")
    reports = convert_all(
        spark, sf_dir, dest, ["region", "no_such_table"], source_tables=["REGION"]
    )
    # case-insensitive intersection keeps region, drops the unknown table
    assert [r.table for r in reports] == ["region"]


def test_skip_existing_second_run_copies_nothing(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "dest")
    convert_all(spark, sf_dir, dest, TABLES)
    second = convert_all(spark, sf_dir, dest, TABLES)
    for r in second:
        assert r.ddl_action == "skipped"
        assert r.data_action == "skipped"
        assert r.result.record_count == 0


def test_skip_all_is_a_noop(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "dest")
    reports = convert_all(
        spark,
        sf_dir,
        dest,
        TABLES,
        ddl_mode=ConvertMode.SKIP_ALL,
        data_mode=ConvertMode.SKIP_ALL,
    )
    for r in reports:
        assert r.ddl_action == "skipped"
        assert r.data_action == "skipped"
    with pytest.raises(Exception):
        spark.read.parquet(f"{dest}/region.parquet")


def test_drop_and_recreate_replaces_stale_data(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "dest")
    # seed a stale destination: region data where nation should live
    load_table(spark, sf_dir, "region").write.parquet(f"{dest}/nation.parquet")
    reports = convert_all(
        spark,
        sf_dir,
        dest,
        ["nation"],
        ddl_mode=ConvertMode.DROP_AND_RECREATE,
        data_mode=ConvertMode.DROP_AND_RECREATE,
    )
    (r,) = reports
    assert r.ddl_action == "dropped_and_recreated"
    assert r.ddl[0] == "DROP TABLE nation"
    assert r.ddl[1].startswith("CREATE TABLE nation (")
    assert r.data_action == "copied"
    n_src = load_table(spark, sf_dir, "nation").count()
    assert r.result.record_count == n_src
    assert spark.read.parquet(f"{dest}/nation.parquet").count() == n_src


def test_data_drop_and_recreate_records_delete_probe(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "dest")
    convert_all(spark, sf_dir, dest, ["region"])
    reports = convert_all(
        spark,
        sf_dir,
        dest,
        ["region"],
        ddl_mode=ConvertMode.SKIP_EXISTING,
        data_mode=ConvertMode.DROP_AND_RECREATE,
    )
    (r,) = reports
    # region is tiny → the deleter would use the single-statement path (W6)
    assert r.delete_strategy == "single_statement"
    assert r.data_action == "copied"
    assert r.result.record_count == load_table(spark, sf_dir, "region").count()


def test_table_fanout_matches_sequential(spark, sf_dir, tmp_path):
    """X1 table-level fan-out (REF/data/DataCopier.java:167-190): a pool
    of concurrent table workers converts ≥3 tables with per-table reports
    identical in order and content to the sequential loop, and the
    destination tree loadable either way."""
    tables = ["region", "nation", "supplier", "part"]
    seq_dest = str(tmp_path / "seq")
    par_dest = str(tmp_path / "par")
    seq = convert_all(spark, sf_dir, seq_dest, tables)
    par = convert_all(spark, sf_dir, par_dest, tables, max_table_workers=4)

    assert [r.table for r in par] == tables  # request order preserved
    for s, p in zip(seq, par):
        assert (s.ddl_action, s.data_action) == (p.ddl_action, p.data_action)
        assert s.ddl == p.ddl
        assert (s.result.record_count, s.result.byte_count) == (
            p.result.record_count,
            p.result.byte_count,
        )
    for t in tables:
        assert (
            spark.read.parquet(f"{par_dest}/{t}.parquet").count()
            == load_table(spark, sf_dir, t).count()
        )
    # worker threads must not leak their scheduler pool onto the session
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None


def test_table_fanout_propagates_worker_exceptions(spark, sf_dir, tmp_path):
    """X7: a failing table inside the pool raises out of convert_all
    instead of being swallowed into a partial report list."""
    dest = str(tmp_path / "dest")
    convert_all(spark, sf_dir, dest, ["region", "nation"])
    with pytest.raises(TableExistsError):
        convert_all(
            spark,
            sf_dir,
            dest,
            ["region", "nation"],
            ddl_mode=ConvertMode.THROW_IF_EXISTS,
            data_mode=ConvertMode.THROW_IF_EXISTS,
            max_table_workers=2,
        )


def test_throw_if_exists_raises_on_nonempty_destination(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "dest")
    convert_all(spark, sf_dir, dest, ["region"])
    with pytest.raises(TableExistsError):
        convert_all(
            spark,
            sf_dir,
            dest,
            ["region"],
            ddl_mode=ConvertMode.THROW_IF_EXISTS,
            data_mode=ConvertMode.THROW_IF_EXISTS,
        )


def test_spanner_vs_postgres_pk_placement(spark, sf_dir, tmp_path):
    ddl_by_dialect = {}
    for dialect in ("cloudspanner", "postgresql"):
        dest = str(tmp_path / f"dest_{dialect}")
        (r,) = convert_all(spark, sf_dir, dest, ["region"], dialect=dialect)
        ddl_by_dialect[dialect] = r.ddl[0]
    assert ddl_by_dialect["cloudspanner"].endswith("PRIMARY KEY (r_regionkey)")
    assert "PRIMARY KEY (r_regionkey))" in ddl_by_dialect["postgresql"]
