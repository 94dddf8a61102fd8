"""Declarative record mapping + rules — the Mapping/MapTransformer/RulesExecutor
analogs compiled to a single DataFrame pass.

Reference pipeline (mapping/.../mapper/Mapping.java:225-269): per record —
FilterChain.evaluate (ignore?) → MapTransformer.transform (source path →
target path, consts, nesting) → typed bind → rules (validate / transform).
Our engine compiles the whole config into ONE ``select`` + ``filter`` +
``withColumns`` chain so Catalyst sees a static plan (column pruning +
predicate pushdown reach the scan; nothing interprets per row).

Mapping spec entries (MappingType.java:19-21 kinds Field/ConstField/Custom):
    {"target": "out_col",        "source": "in_col"}          # rename/project
    {"target": "nested.leaf",    "source": "in_col"}          # nesting via struct
    {"target": "out_col",        "const":  42}                # ConstField
    {"target": "out_col",        "expr":   "a + b"}           # computed (SpEL analog)

Rules (mapping/.../rules/: RuleType Filter/Validation/Transformation):
    Rule("filter",         predicate_sql)                     # drop row silently
    Rule("validation",     predicate_sql, error="msg")        # fail row → quarantine
    Rule("transformation", target=col, expr=sql)              # write a field
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compile_mapping(df: DataFrame, spec: list[dict],
                    keep_unmapped_as: str | None = None) -> DataFrame:
    """MapTransformer.transform (MapTransformer.java:67-141) as one select.

    Dot-separated targets build nested structs (the nested-map walk at
    MapTransformer.java:143-207). ``keep_unmapped_as`` captures unmapped
    source columns into a map column (PropertyBag wildcard capture,
    Mapping.java:274-280).
    """
    tree: dict = {}
    used_sources: set[str] = set()
    for ent in spec:
        parts = ent["target"].split(".")
        node = tree
        for i, p in enumerate(parts[:-1]):
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(
                    f"conflicting mapping targets: {ent['target']!r} nests "
                    f"under {'.'.join(parts[:i + 1])!r}, which an earlier "
                    "spec entry already assigned as a leaf column")
        if isinstance(node.get(parts[-1]), dict):
            raise ValueError(
                f"conflicting mapping targets: {ent['target']!r} would "
                "overwrite a struct built by earlier nested entries "
                f"(e.g. {ent['target']}.<child>)")
        if parts[-1] in node:
            # a duplicated leaf target is the common copy-paste mistake —
            # last-one-wins would silently drop the earlier mapping, while
            # the two structural conflicts above already raise
            raise ValueError(
                f"duplicate mapping target {ent['target']!r}: an earlier "
                "spec entry already assigns it")
        if "source" in ent:
            node[parts[-1]] = F.col(ent["source"])
            used_sources.add(ent["source"])
        elif "const" in ent:
            node[parts[-1]] = F.lit(ent["const"])
        else:
            node[parts[-1]] = F.expr(ent["expr"])
            # columns consumed by the expression are mapped, not "unmapped
            # extras" — word-boundary match against known source columns
            # (heuristic: a quoted literal containing a column name would
            # also match, which only over-excludes)
            import re
            used_sources |= {c for c in df.columns
                             if re.search(rf"\b{re.escape(c)}\b", ent["expr"])}

    def build(node) -> Column:
        if isinstance(node, Column):
            return node
        return F.struct(*[build(v).alias(k) for k, v in node.items()])

    cols = [build(v).alias(k) for k, v in tree.items()]
    if keep_unmapped_as:
        extras = [c for c in df.columns if c not in used_sources]
        kv = []
        for c in extras:
            kv += [F.lit(c), F.col(c).cast("string")]
        cols.append(F.create_map(*kv).alias(keep_unmapped_as) if kv
                    else F.create_map().cast("map<string,string>").alias(keep_unmapped_as))
    return df.select(*cols)


@dataclass
class Rule:
    """One rule of the chain (BaseRule.java:102-170 / SpELRule.java:37-63);
    predicates/expressions are SQL strings = the SpEL-expression analog."""
    kind: str                      # filter | validation | transformation
    predicate: str | None = None   # for filter (ignore when true) / validation (fail when FALSE)
    error: str | None = None       # validation error tag
    target: str | None = None      # transformation target column
    expr: str | None = None        # transformation expression


def apply_rules(df: DataFrame, rules: list[Rule],
                errors_col: str = "_errors") -> tuple[DataFrame, DataFrame]:
    """Compile the rule chain into one pass; returns (good, quarantined).

    * filter rules short-circuit rows out silently (FilterChain.java:82-99
      IgnoreRecord status);
    * validation failures accumulate into an error array — the row routes to
      the quarantine frame (EntityValidationError upsert semantics,
      PersistencePipeline.java:80-93);
    * transformation rules write their target field (RuleType.Transformation).

    CHAIN ORDER is honored exactly as RulesExecutor runs it (sequentially,
    RulesExecutor.java:63): a validation placed after a transformation sees
    the transformed value, a filter after a transformation filters on it.
    Each validation verdict is materialized as a boolean column at its chain
    position, so a later transformation overwriting a referenced column
    cannot retroactively change an earlier verdict — and the whole chain is
    still ONE static Catalyst plan (a linear Project/Filter stack).
    """
    verdicts: list[tuple[str, str]] = []
    for i, r in enumerate(rules):
        if r.kind == "filter":
            df = df.filter(~F.coalesce(F.expr(r.predicate), F.lit(False)))
        elif r.kind == "validation":
            flag = f"_rule_ok_{i}"
            df = df.withColumn(flag,
                               F.coalesce(F.expr(r.predicate), F.lit(False)))
            verdicts.append((flag, r.error or r.predicate))
        elif r.kind == "transformation":
            df = df.withColumn(r.target, F.expr(r.expr))
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")
    if verdicts:
        errs = F.array(*[F.when(~F.col(flag), F.lit(tag))
                         for flag, tag in verdicts])
        df = (df.withColumn(errors_col, F.filter(errs, lambda x: x.isNotNull()))
              .drop(*[flag for flag, _ in verdicts]))
    else:
        df = df.withColumn(errors_col, F.array().cast("array<string>"))
    good = df.filter(F.size(errors_col) == 0).drop(errors_col)
    bad = df.filter(F.size(errors_col) > 0)
    return good, bad


def lookup_enrich(df: DataFrame, ref: DataFrame, on: dict[str, str],
                  mapping: dict[str, str] | None = None,
                  order_by: list[str] | None = None,
                  descending: bool = False,
                  exists_col: str | None = None) -> DataFrame:
    """Entity-reference lookup rule — the DB-rule family compiled to one
    broadcast left join (mapping/.../rules/db/): ``DBExistsRule`` (record
    matched a reference row → boolean, DBExistsRule.java:28-45) and
    ``DBReferenceRule`` (copy fields from the FIRST matching reference
    entity onto the record; null source values never overwrite,
    DBReferenceRule.java:35-64).

    * ``on``: record column → reference column equality (the rule's
      parameterized where-fields, DBRule.java setup).
    * ``mapping``: target record column → reference source column
      (``targetMappings``/``sourceFields``). A target that already exists
      keeps its value when the reference value is null (the reference's
      ``if (value != null) set`` guard); a new target is simply the
      reference value.
    * ``order_by``: pins "first match" when the reference has duplicate
      keys — the reference takes ``entities.get(0)`` in store order, which
      is nondeterministic under parallelism; we require an explicit order
      and pre-reduce the reference to one row per key with ``min_by``
      (ascending — smallest wins) or ``max_by`` when ``descending=True``
      (the dedupe-by-recency form: ``order_by=["updated_at"],
      descending=True`` keeps the LATEST reference row), so the join stays
      1:1 and never multiplies records. Omit it only when the reference is
      already unique per key (enforced neither here nor in the reference —
      document your dimension).
    * ``exists_col``: optional boolean match flag (DBExistsRule) — use it
      in a downstream validation rule to quarantine unmatched records.

    The per-record LRU query cache of the reference (DBRule.CacheRecord)
    has no analog here because the broadcast hash table IS the cache —
    built once, shipped to every task."""
    keys = list(on.items())
    ref_keys = [r for _, r in keys]
    src_cols = sorted(set((mapping or {}).values()))
    # ordering columns ride along even when they aren't copied targets —
    # the natural dedupe-by-recency call orders by a column it never maps
    ord_extra = [c for c in (order_by or [])
                 if c not in ref_keys and c not in src_cols]
    proj = ref.select(*ref_keys,
                      *[c for c in src_cols if c not in ref_keys],
                      *ord_extra)
    if order_by:
        pick = F.max_by if descending else F.min_by
        picked = [pick(F.struct(*[c for c in proj.columns
                                  if c not in ref_keys]),
                       F.struct(*order_by)).alias("_ref")]
        proj = (proj.groupBy(*ref_keys).agg(*picked)
                .select(*ref_keys, "_ref.*").drop(*ord_extra))
    cond = None
    for rec_col, ref_col in keys:
        c = df[rec_col] == proj[ref_col]
        cond = c if cond is None else cond & c
    # explicit select (not withColumn+drop): a target named like a reference
    # column would otherwise be ambiguous after the join
    mapping = mapping or {}
    out_cols = []
    for c in df.columns:
        if c in mapping:
            out_cols.append(F.coalesce(proj[mapping[c]], df[c]).alias(c))
        else:
            out_cols.append(df[c])
    out_cols += [proj[source].alias(target)
                 for target, source in mapping.items()
                 if target not in df.columns]
    if exists_col:
        # a ref key column is non-null exactly when the join matched
        out_cols.append(proj[ref_keys[0]].isNotNull().alias(exists_col))
    return df.join(F.broadcast(proj), cond, "left").select(*out_cols)
