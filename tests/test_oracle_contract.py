"""CI gate for the driver contract: every queries()/oracle_sql() pair
must agree at sf0.001 (the driver runs the same comparison at sf0.01).
Catches contract regressions in pytest instead of the driver's loop."""

import os
import sys

import pytest


def test_oracle_contract_sf0001(ray_session):
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(sf_dir):
        pytest.skip("driver testdata not present")
    sys.path.insert(0, "/root/repo/tools")
    try:
        import check_oracle
    finally:
        sys.path.pop(0)
    assert check_oracle.run(sf_dir) == 0
