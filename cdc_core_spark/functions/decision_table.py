"""Decision-table rules engine — the external/Drools rule-engine analog
(`mapping/.../rules/drools/`, `mapping/.../rules/ExternalRule.java`) compiled
to ONE static Catalyst plan.

The reference plugs Drools in as an opaque per-record rule engine: rules with
a condition (LHS), actions that mutate the bound fact (RHS), **salience**
priority ordering on the agenda, and **activation groups** (first matching
rule in the group fires, the rest are skipped). We keep exactly those
semantics but compile the whole table into a linear ``withColumns`` stack of
``CASE WHEN`` expressions, so at 100 TB the "rule engine" is whole-stage
codegen over the scan — no per-row interpreter, no Python in the loop.

Contract (deterministic, oracle-checkable):
* **Agenda order** = salience descending, declaration order as tiebreak
  (Drools leaves equal-salience order unspecified; we pin it).
* Each rule's condition is evaluated against the CURRENT row state — i.e.
  it sees the writes of every rule earlier on the agenda (forward-chaining
  visibility within the single pass). The verdict is materialized before the
  actions run, so a rule overwriting a column it matched on cannot
  retroactively change its own (or a later group-mate's) firing.
* All actions of one rule are applied ATOMICALLY against the pre-rule state
  (``withColumns`` evaluates every expression before any assignment), so
  ``{"a": "b", "b": "a"}`` swaps.
* A NULL condition is False (SQL tri-state folded, matching the rule chain
  in ``mapping.apply_rules``).
* ``fired_col`` (optional) records the comma-joined names of the rules that
  fired for the row, in agenda order — the Drools agenda-event-listener
  analog, flattened to a scalar so it stays cheap to store and audit.

``apply_decision_table_fixpoint`` adds true forward chaining: re-run the
pass until the table state stops changing (Drools' fire-until-agenda-empty
with refraction-by-quiescence). Each pass is its own static plan with a
``localCheckpoint`` between passes to keep lineage flat; non-convergence
within ``max_passes`` raises instead of returning silently partial state
(same contract as ``operators.dedup.connected_components``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class DecisionRule:
    """One row of the decision table (ExternalRule.java analog)."""
    name: str
    when: str                           # SQL predicate (LHS)
    then: dict[str, str] = field(default_factory=dict)  # col -> SQL expr (RHS)
    salience: int = 0                   # higher fires earlier
    activation_group: str | None = None  # first match in group wins


def agenda(rules: list[DecisionRule]) -> list[DecisionRule]:
    """Salience-desc ordering with declaration-order tiebreak (stable)."""
    return [r for _, r in sorted(enumerate(rules),
                                 key=lambda t: (-t[1].salience, t[0]))]


def apply_decision_table(df: DataFrame, rules: list[DecisionRule],
                         fired_col: str | None = None) -> DataFrame:
    """One agenda pass over the table; see module contract above."""
    ordered = agenda(rules)
    group_flag: dict[str, str] = {}
    fire_flags: list[tuple[str, str]] = []   # (flag col, rule name)

    for i, r in enumerate(ordered):
        cond = F.coalesce(F.expr(r.when), F.lit(False))
        if r.activation_group is not None:
            flag = group_flag.get(r.activation_group)
            if flag is None:
                flag = f"_ag_{len(group_flag)}"
                group_flag[r.activation_group] = flag
                df = df.withColumn(flag, F.lit(False))
            cond = cond & ~F.col(flag)
        fire = f"_fire_{i}"
        # verdict materialized BEFORE actions: a rule that rewrites a column
        # it matched on keeps its original verdict, and group-mates see the
        # pre-action membership state
        df = df.withColumn(fire, cond)
        updates = {}
        for col, expr in r.then.items():
            prev = F.col(col) if col in df.columns else F.lit(None)
            updates[col] = F.when(F.col(fire), F.expr(expr)).otherwise(prev)
        if updates:
            df = df.withColumns(updates)
        if r.activation_group is not None:
            flag = group_flag[r.activation_group]
            df = df.withColumn(flag, F.col(flag) | F.col(fire))
        fire_flags.append((fire, r.name))

    if fired_col is not None:
        names = F.array(*[F.when(F.col(flag), F.lit(name))
                          for flag, name in fire_flags])
        df = df.withColumn(fired_col,
                           F.array_join(F.filter(names,
                                                 lambda x: x.isNotNull()), ","))
    return df.drop(*[flag for flag, _ in fire_flags], *group_flag.values())


def apply_decision_table_fixpoint(df: DataFrame, rules: list[DecisionRule],
                                  max_passes: int = 10,
                                  fired_col: str | None = None) -> DataFrame:
    """Forward-chain to quiescence: repeat the agenda pass until a pass
    leaves the table unchanged AS A MULTISET (cheap order-insensitive
    sum-of-row-hash checksum — one aggregate per pass, no exceptAll
    shuffle-join). Multiset equality is the right fixpoint notion here:
    a DataFrame has no row identity, and the pass is a deterministic
    row-wise function, so a pass-invariant multiset stays invariant under
    every further pass even if individual tuples exchange states (e.g. two
    otherwise-identical rows with opposite flags that a rule flips — the
    relation is stable, and we correctly declare quiescence rather than
    oscillation). The checksum is probabilistic: two different multisets
    collide with probability ~2^-64 per comparison (sum of xxhash64) —
    the standard sketch trade, chosen over an exact exceptAll that would
    shuffle the full table once per pass. Raises RuntimeError if
    ``max_passes`` passes don't converge — silent partial state is worse
    than failing loudly. ``fired_col`` reflects the LAST pass only (at
    quiescence that is the stable activation set).

    Cost per pass is ONE full-data job: the checksum rides the
    checkpoint's materialization as an ``Observation`` aggregate instead
    of a second scan (only the pass-0 baseline over the INPUT frame is a
    standalone aggregate job — there is no materialization to ride
    there)."""
    from pyspark.sql import Observation

    def _crc_expr(d: DataFrame):
        # hash the frame's CURRENT columns, not the input's: rules may write
        # rule-created columns, and a checksum blind to them would declare
        # quiescence while that state keeps changing (a pass that only adds
        # a new column trivially differs from its input, which just means
        # "not converged yet" — correct). decimal sum: long xxhash64 values
        # overflow a BIGINT accumulator under ANSI mode
        # fired_col reflects the LAST pass only (documented) — including
        # it would make the very first pass always register as a change,
        # failing max_passes=1 rulesets that are genuinely quiescent
        cols = sorted(c for c in d.columns if c != fired_col)
        return F.sum(F.xxhash64(*[F.col(c) for c in cols])
                     .cast("decimal(20,0)")).alias("h")

    base = df.select(_crc_expr(df)).collect()[0]["h"]
    prev = int(base) if base is not None else 0
    for i in range(max_passes):
        df = apply_decision_table(df, rules, fired_col=fired_col)
        obs = Observation(f"dt_fixpoint_{i}")
        df = df.observe(obs, _crc_expr(df)).localCheckpoint(eager=True)
        h = obs.get["h"]
        cur = int(h) if h is not None else 0
        if cur == prev:
            return df
        prev = cur
    raise RuntimeError(
        f"decision table did not reach quiescence in {max_passes} passes; "
        "a rule keeps rewriting state (check for oscillating actions)")
