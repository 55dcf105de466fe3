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
