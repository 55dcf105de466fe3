"""Driver-contract smoke tests for __spark_entry__."""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None


def test_contract_key_consistency():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "queries() must not be empty"
    assert set(o).issubset(set(q))
    for name, fn in q.items():
        assert callable(fn), name


def test_registry_rotation_window():
    """The driver verifies the first 50 registry entries per round.

    Never-driver-verified entries (from the CORRECTNESS_r*.json history)
    must lead the iteration order; any remaining window slots must be
    filled with previously-verified entries so regressions resurface.
    Rotation must never drop or duplicate keys.
    """
    from blockchair_etl_spark.queryset import (
        _DRIVER_WINDOW,
        _load_driver_verified,
        QUERIES,
    )

    verified, latest_round = _load_driver_verified()
    assert latest_round >= 1
    keys = list(QUERIES)
    assert len(keys) == len(set(keys))
    unverified = [k for k in keys if k not in verified]
    # every never-verified entry sits ahead of every verified entry
    assert keys[: len(unverified)] == unverified
    # spare window slots are used for re-verification of old entries
    window = keys[:_DRIVER_WINDOW]
    spare = max(0, _DRIVER_WINDOW - len(unverified))
    if spare and verified:
        assert sum(1 for k in window if k in verified) == min(
            spare, len(verified)
        )


def test_rotation_offset_advances_with_round(monkeypatch):
    """Different round numbers must put a different verified subset in
    the window (the anti-staleness property the rotation exists for)."""
    import blockchair_etl_spark.queryset as qs

    verified, _ = qs._load_driver_verified()
    if len(verified) < qs._DRIVER_WINDOW:
        return  # not enough verified entries for the property to bind

    def windows_for(round_n):
        monkeypatch.setattr(
            qs, "_load_driver_verified", lambda: (verified, round_n)
        )
        qs._rotate_registry()
        return list(qs.QUERIES)[: qs._DRIVER_WINDOW]

    try:
        w1, w2 = windows_for(1), windows_for(2)
        assert set(w1) != set(w2)
    finally:
        monkeypatch.undo()
        qs._rotate_registry()
