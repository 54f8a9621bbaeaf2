"""Oracle parity for every query that declares an oracle — the local
mirror of the driver's CORRECTNESS gate (sf0.001 by default; set
SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 for the driver's scale).
"""

from __future__ import annotations

import pytest

from dist_map_reduce_spark import registry
from tests.conftest import assert_parity

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)
