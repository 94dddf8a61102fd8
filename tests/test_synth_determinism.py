"""The generator is the contract fixture — it must be bit-deterministic."""

from __future__ import annotations

import pandas as pd

from cdc_core_spark import synth


def test_generate_deterministic():
    a = synth.generate("t1")
    b = synth.generate("t1")
    pd.testing.assert_frame_equal(a.source_repos, b.source_repos)
    pd.testing.assert_frame_equal(a.change_events, b.change_events)


def test_fixture_shape_invariants():
    fx = synth.generate("t1")
    ev = fx.change_events
    data = ev[ev["op"].isin([3, 4, 5])]
    # hot repo holds ≥ 30% of events
    hot_frac = (data["repo"] == "org0/repo0").mean()
    assert hot_frac >= 0.25, hot_frac
    # duplicates exist (at-least-once fixture)
    dups = data.duplicated(["repo", "path", "op_ts", "event_seq"]).sum()
    assert dups > 0
    # every dedup key is unique after dropping duplicates
    dd = data.drop_duplicates(["repo", "path", "op_ts", "event_seq"])
    assert not dd.duplicated(["repo", "path", "op_ts", "event_seq"]).any()
    # out-of-order op_ts vs event_seq exists within keys
    d = dd.sort_values("event_seq")
    ooo = (d.groupby(["repo", "path"])["op_ts"].diff() < 0).sum()
    assert ooo > 0
    # schema episodes present at their epochs
    sch = ev[ev["op"] == 1]
    assert list(sch["checkpoint_epoch"]) == [3, 5, 6]
    assert list(sch["schema_version"]) == ["1.1", "2.0", "2.1"]
    # malformed fixture present
    assert (ev["op"] > 5).any() and ev["repo"].isna().any()
