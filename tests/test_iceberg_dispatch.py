"""Iceberg backend dispatch + SQL shapes (VERDICT r2 item 6). No Iceberg jar
ships in-sandbox, so these tests mock the gate and assert the factory routes
correctly and the MERGE/DELETE statements are well-formed; the parquet
emulation path is exercised for real by test_manifest_resume.py.
"""

from log_parser_mind_spark.sources import iceberg, tables
from log_parser_mind_spark.sources.manifest import SnapshotStore


def test_gate_is_false_in_sandbox(spark):
    assert tables.iceberg_available(spark) is False


def test_factory_dispatches_on_gate(spark, tmp_path, monkeypatch):
    # gate false → parquet emulation, regardless of namespace
    s = iceberg.snapshot_store(spark, str(tmp_path), namespace="lpm")
    assert isinstance(s, SnapshotStore)
    # gate true + namespace → real catalog backend
    monkeypatch.setattr(iceberg, "iceberg_available", lambda _s: True)
    s2 = iceberg.snapshot_store(spark, str(tmp_path), namespace="lpm")
    assert isinstance(s2, iceberg.IcebergStore)
    assert s2._table("parsed_turns") == "lpm.parsed_turns"
    # gate true but NO namespace configured → still the emulation
    s3 = iceberg.snapshot_store(spark, str(tmp_path))
    assert isinstance(s3, SnapshotStore)


def test_merge_upsert_sql_shape():
    sql = iceberg.merge_upsert_sql(
        "lpm.templates", "_upsert_templates", ["template_id"], ["pattern", "log_count"]
    )
    assert sql == (
        "MERGE INTO lpm.templates t USING _upsert_templates s "
        "ON t.template_id = s.template_id "
        "WHEN MATCHED THEN UPDATE SET t.pattern = s.pattern, t.log_count = s.log_count "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_expire_months_sql_is_partition_predicate():
    sql = iceberg.expire_months_sql("lpm.parsed_turns", "2024-02")
    assert sql == "DELETE FROM lpm.parsed_turns WHERE month < '2024-02'"


def test_iceberg_store_surface_matches_snapshot_store():
    """The two backends must stay call-compatible for plans/job.py."""
    import inspect

    for name in ("commit", "read", "latest_snapshot", "expire"):
        ice = inspect.signature(getattr(iceberg.IcebergStore, name))
        emu = inspect.signature(getattr(SnapshotStore, name))
        ice_req = [p for p, v in ice.parameters.items() if v.default is inspect.Parameter.empty]
        emu_req = [p for p, v in emu.parameters.items() if v.default is inspect.Parameter.empty]
        assert ice_req == emu_req, name
