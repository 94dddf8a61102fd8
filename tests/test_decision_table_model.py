"""Model check: randomized decision tables vs a row-at-a-time reference
interpreter. The Spark engine compiles the agenda to one static CASE-WHEN
plan; the model executes the published contract literally (salience-desc
agenda, first-match activation groups, condition on current state, verdict
before actions, atomic RHS, NULL→False). Any divergence is a compiler bug."""

from __future__ import annotations

import random

from cdc_core_spark.functions.decision_table import (
    DecisionRule, agenda, apply_decision_table)

COLS = ["a", "b", "c"]


def _interpret(rows: list[dict], rules: list[DecisionRule]) -> list[dict]:
    """Reference semantics, one row at a time (the Drools-style agenda)."""
    out = []
    for r0 in rows:
        row = dict(r0)
        fired_groups: set[str] = set()
        fired: list[str] = []
        for r in agenda(rules):
            cond = _eval(r.when, row)
            if r.activation_group is not None and r.activation_group in fired_groups:
                cond = False
            if cond:
                # atomic RHS: evaluate every action against the pre-rule state
                new = {col: _eval_expr(ex, row) for col, ex in r.then.items()}
                row.update(new)
                fired.append(r.name)
                if r.activation_group is not None:
                    fired_groups.add(r.activation_group)
        row["fired"] = ",".join(fired)
        out.append(row)
    return out


def _eval(pred: str, row: dict) -> bool:
    v = _eval_expr(pred, row)
    return bool(v) if v is not None else False  # NULL -> False


def _eval_expr(expr: str, row: dict):
    # the generated grammar below only emits exprs valid in both SQL and
    # Python once comparison null-semantics are handled
    env = dict(row)
    if any(env[c] is None for c in COLS if c in expr.split()):
        # SQL tri-state: any arithmetic/comparison touching NULL is NULL
        return None
    return eval(expr, {"__builtins__": {}}, env)  # noqa: S307 (test-only)


def _gen_rules(rng: random.Random) -> list[DecisionRule]:
    rules = []
    for i in range(rng.randint(1, 6)):
        col = rng.choice(COLS)
        pred = f"{col} {rng.choice(['>', '<', '>='])} {rng.randint(-5, 5)}"
        tgt = rng.choice(COLS)
        action = rng.choice([
            f"{tgt} + {rng.randint(1, 3)}",
            f"{rng.randint(-10, 10)}",
            f"{rng.choice(COLS)} * 2",
        ])
        rules.append(DecisionRule(
            name=f"r{i}", when=pred, then={tgt: action},
            salience=rng.randint(-2, 2),
            activation_group=rng.choice([None, "g1", "g2"])))
    return rules


def test_random_tables_match_reference_interpreter(spark):
    rng = random.Random(20260817)
    for trial in range(12):
        rows = [{"id": i,
                 "a": rng.choice([None, rng.randint(-5, 5)]),
                 "b": rng.randint(-5, 5),
                 "c": rng.randint(-5, 5)}
                for i in range(40)]
        rules = _gen_rules(rng)
        df = spark.createDataFrame(
            [(r["id"], r["a"], r["b"], r["c"]) for r in rows],
            "id int, a int, b int, c int")
        got = {r["id"]: (r["a"], r["b"], r["c"], r["fired"])
               for r in apply_decision_table(df, rules,
                                             fired_col="fired").collect()}
        want = {r["id"]: (r["a"], r["b"], r["c"], r["fired"])
                for r in _interpret(rows, rules)}
        assert got == want, f"trial {trial} rules={rules}"
