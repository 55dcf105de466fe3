"""Mirror of the driver's correctness gate: every queries() entry must
hash-match its oracle_sql() on DuckDB over the same parquet tables."""

import pytest

from blockchair_etl_spark.queryset import QUERIES
from blockchair_etl_spark.testing import check_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    r = check_query(spark, sf_dir, name, oracle_con)
    assert r.ok, f"{name}: rows={r.spark_rows}/{r.oracle_rows} {r.mismatches}"


def test_registry_has_oracles():
    # Non-SQL-expressible ops may omit the oracle, but the bulk of the
    # inventory must carry one (the driver's strong check).
    with_oracle = [n for n, s in QUERIES.items() if s.oracle]
    assert len(with_oracle) >= 0.8 * len(QUERIES)
