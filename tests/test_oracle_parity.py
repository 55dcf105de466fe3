"""Mirror of the driver's correctness gate: every queries() entry must
hash-match its oracle_sql() on DuckDB over the same parquet tables."""

import pytest

from blockchair_etl_spark.queryset import QUERIES
from blockchair_etl_spark.testing import check_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    r = check_query(spark, sf_dir, name, oracle_con)
    assert r.ok, f"{name}: rows={r.spark_rows}/{r.oracle_rows} {r.mismatches}"


def test_pytest_only_twins_off_driver_surface():
    """r14 window-budget retirement: the four instrumentation twins are
    pytest-only — absent from the driver surface (queries()/oracle_sql())
    but still in QUERIES WITH their oracles, so the parametrized parity
    test above keeps hash-checking them every pytest run."""
    import __spark_entry__ as mod

    twins = {
        "dedup_minhash_accuracy",
        "dedup_simhash_accuracy",
        "ann_ivfpq_recall",
        "ann_lsh_recall",
    }
    q, o = mod.queries(), mod.oracle_sql()
    for name in twins:
        assert name not in q and name not in o
        assert name in QUERIES and QUERIES[name].oracle  # pytest gate stays
    # every driver-visible entry still round-trips
    assert set(o) <= set(q)
    assert all(QUERIES[n].driver for n in q)


def test_registry_has_oracles():
    # Non-SQL-expressible ops may omit the oracle, but the bulk of the
    # inventory must carry one (the driver's strong check).
    with_oracle = [n for n, s in QUERIES.items() if s.oracle]
    assert len(with_oracle) >= 0.8 * len(QUERIES)


def test_harness_detects_mismatches(spark, sf_dir, oracle_con):
    # Meta-test: a gate that can't fail is no gate. Perturb each class of
    # defect against a real oracle and assert compare_frames flags it.
    import pandas as pd

    from blockchair_etl_spark.testing import compare_frames

    want = oracle_con.execute(QUERIES["q1_pricing_summary"].oracle).fetchdf()

    # 1. dropped row
    r = compare_frames("meta_rows", want.iloc[:-1].copy(), want)
    assert not r.ok

    # 2. renamed column (schema drift)
    renamed = want.rename(columns={want.columns[0]: "__wrong"})
    r = compare_frames("meta_schema", renamed, want)
    assert not r.ok

    # 3. single perturbed value (hash sensitivity)
    num_cols = [c for c in want.columns if pd.api.types.is_numeric_dtype(want[c])]
    perturbed = want.copy()
    perturbed.loc[perturbed.index[0], num_cols[0]] += 1
    r = compare_frames("meta_value", perturbed, want)
    assert not r.ok

    # 4. identical frames pass even with shuffled row/column order
    shuffled = want.sample(frac=1.0, random_state=7)[list(reversed(want.columns))]
    r = compare_frames("meta_ok", shuffled, want)
    assert r.ok
