"""Decision-table rules engine (Drools analog) — agenda ordering, activation
groups, atomic RHS, verdict materialization, forward-chaining fixpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_core_spark.functions.decision_table import (
    DecisionRule, agenda, apply_decision_table, apply_decision_table_fixpoint)


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(cols[0]).collect()]


def test_agenda_salience_desc_stable():
    rs = [DecisionRule("a", "true"), DecisionRule("b", "true", salience=5),
          DecisionRule("c", "true"), DecisionRule("d", "true", salience=5)]
    assert [r.name for r in agenda(rs)] == ["b", "d", "a", "c"]


def test_activation_group_first_match_only(spark):
    df = spark.createDataFrame([(1, 400.0), (2, 200.0), (3, 50.0)],
                               "id int, amt double")
    rules = [
        DecisionRule("vip", "amt > 300", {"tier": "'VIP'"},
                     salience=10, activation_group="tier"),
        DecisionRule("high", "amt > 100", {"tier": "'HIGH'"},
                     salience=5, activation_group="tier"),
        DecisionRule("base", "true", {"tier": "'BASE'"},
                     activation_group="tier"),
    ]
    out = apply_decision_table(df, rules, fired_col="fired")
    assert _rows(out, "id", "tier", "fired") == [
        (1, "VIP", "vip"), (2, "HIGH", "high"), (3, "BASE", "base")]
    # internal flag columns are cleaned up
    assert set(out.columns) == {"id", "amt", "tier", "fired"}


def test_rhs_atomic_swap_and_new_column(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    out = apply_decision_table(df, [
        DecisionRule("swap", "true", {"a": "b", "b": "a", "c": "a + b"})])
    assert _rows(out, "a", "b", "c") == [(2, 1, 3)]


def test_condition_sees_earlier_writes_but_own_verdict_fixed(spark):
    """Later rules see earlier rules' writes (forward-chaining visibility);
    a rule rewriting its own matched column keeps its verdict in fired."""
    df = spark.createDataFrame([(1, 10)], "id int, x int")
    rules = [
        DecisionRule("bump", "x = 10", {"x": "x + 1"}, salience=1),
        DecisionRule("sees_bump", "x = 11", {"x": "x * 2"}),
    ]
    out = apply_decision_table(df, rules, fired_col="fired")
    assert _rows(out, "x", "fired") == [(22, "bump,sees_bump")]


def test_null_condition_is_false(spark):
    df = spark.createDataFrame([(1, None), (2, 5)], "id int, x int")
    out = apply_decision_table(
        df, [DecisionRule("r", "x > 1", {"hit": "true"})], fired_col="fired")
    assert _rows(out, "id", "hit", "fired") == [
        (1, None, ""), (2, True, "r")]


def test_fixpoint_converges_and_matches_manual_iteration(spark):
    df = spark.createDataFrame([(1, 0), (2, 3)], "id int, x int")
    rules = [DecisionRule("inc", "x < 5", {"x": "x + 1"})]
    out = apply_decision_table_fixpoint(df, rules, max_passes=10,
                                        fired_col="fired")
    # quiescence: everyone climbs to 5 and the final pass fires nothing
    assert _rows(out, "id", "x", "fired") == [(1, 5, ""), (2, 5, "")]


def test_fixpoint_raises_on_non_convergence(spark):
    df = spark.createDataFrame([(1, 0)], "id int, x int")
    with pytest.raises(RuntimeError, match="quiescence"):
        apply_decision_table_fixpoint(
            df, [DecisionRule("osc", "true", {"x": "1 - x"})], max_passes=4)


def test_salience_orders_cross_group_dependencies(spark):
    """Low-salience cap rule runs after the tier group it depends on."""
    df = spark.createDataFrame([(1, 400.0, "1-URGENT"), (2, 200.0, "5-LOW")],
                               "id int, amt double, prio string")
    rules = [
        DecisionRule("cap", "pm > 60", {"pm": "60"}, salience=-10),
        DecisionRule("urgent", "prio = '1-URGENT'", {"pm": "pm + 20"},
                     salience=-5),
        DecisionRule("vip", "amt > 300", {"pm": "100"},
                     salience=10, activation_group="t"),
        DecisionRule("high", "amt > 100", {"pm": "50"},
                     salience=5, activation_group="t"),
    ]
    out = apply_decision_table(df.withColumn("pm", F.lit(0)), rules,
                               fired_col="fired")
    assert _rows(out, "id", "pm", "fired") == [
        (1, 60, "vip,urgent,cap"), (2, 50, "high")]


def test_fixpoint_checksums_rule_created_columns(spark):
    """The convergence checksum hashes the frame's CURRENT columns, not the
    input's — state carried only in rule-created columns must count toward
    quiescence (and converge here: the created values are stable functions
    of stable inputs)."""
    from cdc_core_spark.functions.decision_table import (
        DecisionRule, apply_decision_table_fixpoint)

    df = spark.createDataFrame([(1,), (5,)], "x long")
    rules = [
        DecisionRule("grow", "x < 3", {"x": "x + 1"}, salience=1),
        DecisionRule("mirror", "true", {"snap": "x * 10"}, salience=0),
    ]
    out = apply_decision_table_fixpoint(df, rules, max_passes=10)
    got = sorted((r["x"], r["snap"]) for r in out.collect())
    assert got == [(3, 30), (5, 50)]


def test_fixpoint_fired_col_quiescent_in_one_pass(spark):
    """fired_col reflects the last pass only and is excluded from the
    convergence checksum — a genuinely quiescent ruleset with fired_col
    must converge even at max_passes=1."""
    from cdc_core_spark.functions.decision_table import (
        DecisionRule, apply_decision_table_fixpoint)

    df = spark.createDataFrame([(1,), (2,)], "x long")
    rules = [DecisionRule("noop", "x < 0", {"x": "x + 1"})]  # never fires
    out = apply_decision_table_fixpoint(df, rules, max_passes=1,
                                        fired_col="fired")
    assert sorted(r["x"] for r in out.collect()) == [1, 2]
    assert all(r["fired"] == "" for r in out.collect())
