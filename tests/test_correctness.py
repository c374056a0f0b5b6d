"""The local mirror of the driver's t2 gate.

Parametrizes over EVERY registered query: oracle-backed ones are
cross-checked against DuckDB; oracle-less ones (streaming/custom) get a
rows-and-schema sanity check. Adding an operator automatically adds its
test — the analog of the reference's golden-file clientpositive corpus
(SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from hive_service_spark.registry import load_all
from tests.conftest import SF_DIR, assert_matches_oracle

_SPECS = load_all()


@pytest.mark.parametrize("name", sorted(_SPECS), ids=str)
def test_query(name, spark, ddb):
    spec = _SPECS[name]
    if spec.oracle is not None:
        assert_matches_oracle(spark, ddb, spec)
    else:
        df = spec.fn(spark, SF_DIR)
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
