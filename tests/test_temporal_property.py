"""Hypothesis property check: asof_join (both plans, both directions,
with/without tolerance) against pandas.merge_asof on adversarial tiny
frames — empty sides, all-equal timestamps, single keys, negative values.

merge_asof is an independent implementation of the identical contract, so
any divergence is a real semantics bug; ties inside (key, ts) are removed
up front because BOTH implementations leave that order unspecified."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_core_spark.operators.temporal import asof_join

_ts = st.integers(min_value=-50, max_value=50)
_key = st.integers(min_value=0, max_value=3)


def _mk(rows, cols):
    df = pd.DataFrame(rows, columns=cols)
    return df.astype({c: "float64" if c in ("ts", "rv") else "int64"
                      for c in cols})


@st.composite
def frames(draw):
    left = draw(st.lists(st.tuples(_key, _ts), min_size=0, max_size=12))
    right = draw(st.lists(st.tuples(_key, _ts), min_size=0, max_size=8))
    l = _mk([(k, t, i) for i, (k, t) in enumerate(left)],
            ["k", "ts", "lid"])
    r = _mk([(k, t, float(i)) for i, (k, t) in enumerate(right)],
            ["k", "ts", "rv"])
    r = r.drop_duplicates(["k", "ts"])  # tie order is unspecified in both
    return l, r


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(fr=frames(),
       direction=st.sampled_from(["backward", "forward", "nearest"]),
       broadcast=st.booleans(),
       exact=st.booleans(),
       tolerance=st.sampled_from([None, 0.0, 7.0]))
def test_asof_matches_merge_asof(spark, fr, direction, broadcast, exact,
                                 tolerance):
    left, right = fr
    # Spark cannot infer a schema for an empty frame — give it DDL
    l = spark.createDataFrame(left, "k long, ts double, lid long")
    r = spark.createDataFrame(right, "k long, ts double, rv double")
    got = (asof_join(l, r, ["k"], "ts", direction=direction,
                     tolerance=tolerance, broadcast=broadcast,
                     allow_exact_matches=exact)
           .toPandas().sort_values("lid").reset_index(drop=True))
    exp = pd.merge_asof(
        left.sort_values(["ts", "lid"]), right.sort_values("ts"),
        on="ts", by="k", direction=direction, suffixes=("", "_r"),
        tolerance=tolerance,
        allow_exact_matches=exact).sort_values("lid").reset_index(drop=True)
    if len(left) == 0:
        assert len(got) == 0
        return
    assert got["rv"].fillna(-999).tolist() == \
        exp["rv"].fillna(-999).tolist()
    # matched ts equals the matched right row's ts, null when unmatched
    m = exp["rv"].notna()
    assert got.loc[~m, "ts_asof"].isna().all()
    if m.any():
        chk = got[m].merge(right, left_on=["k", "ts_asof"],
                           right_on=["k", "ts"], how="left",
                           suffixes=("", "_c"))
        assert (chk["rv"] == chk["rv_c"]).all()
