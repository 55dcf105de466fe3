"""Schema inference + widening ratchet (SURVEY §2 I1-I3)."""

import pandas as pd
import pytest

from blockchair_etl_spark.schema.inference import (
    ColumnType,
    SchemaRegistry,
    SchemaSkip,
    apply_ratchet,
    detect_datetime,
    emit_ddl,
    from_json,
    infer_from_pandas,
    infer_from_tsv,
    sanitize_column_name,
    to_json,
    to_struct_type,
    varchar_tier,
)


def test_varchar_tiers():
    assert varchar_tier(None) == 64
    assert varchar_tier(1) == 16
    assert varchar_tier(16) == 16
    assert varchar_tier(17) == 32
    assert varchar_tier(300) == 512
    assert varchar_tier(10**9) == 262144  # capped at the top tier


def test_sanitize_column_names():
    assert sanitize_column_name("block id(v2)") == "BLOCK_ID_V2"
    assert sanitize_column_name("9lives") == "COL_9LIVES"
    assert sanitize_column_name("", 7) == "COL_7"
    assert sanitize_column_name("__x__") == "X"


def test_datetime_detection():
    assert detect_datetime(pd.Series(["2024-01-02", "2024-02-03"])) == ColumnType("date")
    assert detect_datetime(pd.Series(["2024-01-02 10:00:00"])) == ColumnType("timestamp")
    assert detect_datetime(pd.Series(["02-03-2024"])) == ColumnType("date")
    assert detect_datetime(pd.Series(["hello"])) is None
    assert detect_datetime(pd.Series([None, None])) is None


def test_decision_tree():
    df = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "rate": [1.5, 2.0, None],
            "flag": [True, False, True],
            "day": ["2024-01-01", "2024-01-02", "2024-01-03"],
            "name": ["a" * 20, "b", None],
            "empty": [None, None, None],
        }
    )
    got = dict(infer_from_pandas(df))
    assert got["ID"] == ColumnType("integer")
    assert got["RATE"] == ColumnType("float")
    assert got["FLAG"] == ColumnType("boolean")
    assert got["DAY"] == ColumnType("date")
    assert got["NAME"] == ColumnType("varchar", 32)
    assert got["EMPTY"] == ColumnType("varchar", 64)


def test_widening_ratchet():
    old = [("A", ColumnType("integer")), ("B", ColumnType("varchar", 32))]
    # wider on one, equal on other → accept
    new = [("A", ColumnType("float")), ("B", ColumnType("varchar", 32))]
    assert apply_ratchet(new, old) == new
    # narrower on any → skip
    with pytest.raises(SchemaSkip):
        apply_ratchet([("A", ColumnType("integer")), ("B", ColumnType("varchar", 16))], old)
    # all equal → skip
    with pytest.raises(SchemaSkip):
        apply_ratchet(old, old)
    # type mismatch → skip
    with pytest.raises(SchemaSkip):
        apply_ratchet([("A", ColumnType("varchar", 64)), ("B", ColumnType("varchar", 32))], old)
    # date → timestamp widens
    assert apply_ratchet(
        [("A", ColumnType("timestamp"))], [("A", ColumnType("date"))]
    ) == [("A", ColumnType("timestamp"))]
    # no stored schema / disjoint columns → accept
    assert apply_ratchet(new, None) == new
    assert apply_ratchet(new, [("Z", ColumnType("integer"))]) == new


def test_infer_from_tsv_via_spark(spark, tmp_path):
    from blockchair_etl_spark.io.extract import write_gzip_tsv

    p = write_gzip_tsv(
        tmp_path / "blockchair_bitcoin_blocks_20250812.tsv.gz",
        ["id", "hash", "time", "fee_rate", "note col!"],
        [
            [1, "a" * 64, "2025-08-12 00:00:00", 0.5, "x"],
            [2, "b" * 64, "2025-08-12 00:10:00", 1.5, None],
        ],
    )
    got = dict(infer_from_tsv(spark, str(p), sample_rows=100))
    assert got["ID"] == ColumnType("integer")
    assert got["HASH"] == ColumnType("varchar", 64)
    assert got["TIME"] == ColumnType("timestamp")
    assert got["FEE_RATE"] == ColumnType("float")
    assert got["NOTE_COL"] == ColumnType("varchar", 16)


def test_roundtrip_json_ddl_struct():
    schema = [("A", ColumnType("integer")), ("B", ColumnType("varchar", 128))]
    assert from_json(to_json(schema)) == schema
    ddl = emit_ddl("blocks_raw", schema)
    assert "CREATE OR REPLACE TABLE blocks_raw" in ddl
    assert "A BIGINT" in ddl and "B VARCHAR(128)" in ddl
    st = to_struct_type(schema)
    assert st.fieldNames() == ["A", "B"]
    assert st["B"].metadata == {"max_length": 128}
    with pytest.raises(ValueError):
        emit_ddl("9bad name", schema)


def test_registry_ratchet_persistence(tmp_path):
    path = str(tmp_path / "registry.json")
    reg = SchemaRegistry(path)
    s1 = [("A", ColumnType("integer"))]
    reg.update("t", s1)
    with pytest.raises(SchemaSkip):
        reg.update("t", s1)  # no widening
    s2 = [("A", ColumnType("float"))]
    reg.update("t", s2)
    # persisted: a fresh registry still enforces the ratchet
    reg2 = SchemaRegistry(path)
    assert reg2.get("t") == s2
    with pytest.raises(SchemaSkip):
        reg2.update("t", s1)
