"""The gate harness's canon must never hash structurally different results
to the same value — a false OK in the verification harness is worse than a
false FAIL."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.driver_sim import canon


def test_separator_cells_do_not_collide():
    a = pd.DataFrame({"x": ["a|b"], "y": ["c"]})
    b = pd.DataFrame({"x": ["a"], "y": ["b|c"]})
    assert canon(a)[0] != canon(b)[0]


def test_null_literal_string_is_not_sql_null():
    a = pd.DataFrame({"x": ["NULL"]})
    b = pd.DataFrame({"x": [None]})
    assert canon(a)[0] != canon(b)[0]


def test_backslash_escape_roundtrip_distinct():
    a = pd.DataFrame({"x": ["a\\|b"], "y": ["c"]})
    b = pd.DataFrame({"x": ["a\\"], "y": ["b|c"]})
    assert canon(a)[0] != canon(b)[0]


def test_float32_nan_canons_as_null():
    """np.float32 is not a subclass of float — a float32 NaN used to canon
    as 'f:nan' while the oracle's float64 NaN canons as NULL."""
    a = pd.DataFrame({"x": pd.array([np.float32("nan")], dtype="float32")})
    b = pd.DataFrame({"x": [float("nan")]})
    assert canon(a)[0] == canon(b)[0]
