"""Schema registry / diff / evolution-validator unit tests, mirroring the
reference rules (SchemaEvolutionValidator.java:122-186,543-555;
EntitySchema.diff/apply, EntitySchema.java:305-453)."""

from __future__ import annotations

import pytest

from cdc_core_spark.registry import (
    SchemaDef, SchemaEvolutionError, SchemaRegistry, diff, validate_evolution,
)
from cdc_core_spark import synth


def _sd(fields, aliases=None, major=1, minor=0):
    return SchemaDef("e", major, minor, tuple(fields), aliases or {})


KEY = [{"name": "k", "type": "string", "nullable": False, "key": True}]


def test_diff_add_drop_modify_rename():
    old = _sd(KEY + [{"name": "a", "type": "int", "nullable": True},
                     {"name": "b", "type": "string", "nullable": True}])
    new = _sd(KEY + [{"name": "a2", "type": "long", "nullable": True},
                     {"name": "c", "type": "double", "nullable": True}],
              aliases={"a": "a2"}, major=2)
    ops = {(o.op, o.name) for o in diff(old, new)}
    assert ("RENAME", "a") in ops
    assert ("ADD", "c") in ops
    assert ("DROP", "b") in ops
    assert ("MODIFY", "a2") in ops  # int → long through the rename


def test_nullable_add_allowed():
    old = _sd(KEY)
    new = _sd(KEY + [{"name": "x", "type": "long", "nullable": True}], minor=1)
    validate_evolution(old, new)  # no raise


def test_required_add_without_default_rejected():
    old = _sd(KEY)
    new = _sd(KEY + [{"name": "x", "type": "long", "nullable": False}], minor=1)
    with pytest.raises(SchemaEvolutionError, match="required"):
        validate_evolution(old, new)


@pytest.mark.parametrize("frm,to,ok", [
    ("int", "long", True), ("int", "double", True), ("long", "double", True),
    ("float", "double", True), ("short", "int", True),
    ("long", "int", False), ("double", "float", False), ("string", "int", False),
    ("double", "long", False),
])
def test_widening_matrix(frm, to, ok):
    old = _sd(KEY + [{"name": "x", "type": frm, "nullable": True}])
    new = _sd(KEY + [{"name": "x", "type": to, "nullable": True}], minor=1)
    if ok:
        validate_evolution(old, new)
    else:
        with pytest.raises(SchemaEvolutionError, match="widening"):
            validate_evolution(old, new)


def test_key_change_rejected():
    old = _sd(KEY + [{"name": "x", "type": "int", "nullable": True}])
    new = _sd([{"name": "k2", "type": "string", "nullable": False, "key": True},
               {"name": "x", "type": "int", "nullable": True}], major=2)
    with pytest.raises(SchemaEvolutionError, match="key"):
        validate_evolution(old, new)


def test_key_widening_rejected():
    """Widening a KEY column is a legal lattice move but an illegal
    evolution: bucket_expr hashes the key's physical type (xxhash64(int 7)
    != xxhash64(bigint 7)), so a widened key re-hashes every existing key
    into a different storage bucket — point lookups and bucket-pruned
    merges would silently miss every pre-widen row. Key types are frozen;
    the same widening on a NON-key column stays legal."""
    ik = [{"name": "k", "type": "int", "nullable": False, "key": True}]
    old = _sd(ik + [{"name": "x", "type": "int", "nullable": True}])
    new = _sd([{"name": "k", "type": "long", "nullable": False, "key": True},
               {"name": "x", "type": "int", "nullable": True}], minor=1)
    with pytest.raises(SchemaEvolutionError, match="key column types are frozen"):
        validate_evolution(old, new)
    # same move on the payload column: fine
    wide_x = _sd(ik + [{"name": "x", "type": "long", "nullable": True}],
                 minor=1)
    validate_evolution(old, wide_x)


def test_drop_is_soft_allowed():
    old = _sd(KEY + [{"name": "x", "type": "int", "nullable": True}])
    new = _sd(KEY, minor=1)
    ops = validate_evolution(old, new)
    assert [o.op for o in ops] == ["DROP"]


def test_fixture_registry_versions_chain():
    reg = SchemaRegistry.from_docs(synth.registry_docs())
    vers = [d.version for d in reg.versions("source_repos")]
    assert vers == ["1.0", "1.1", "2.0", "2.1"]
    chain = reg.versions("source_repos")
    for old, new in zip(chain, chain[1:]):
        validate_evolution(old, new)  # every episode is a legal evolution
    assert reg.get("source_repos", "2.0").aliases == {"lang": "language"}


def test_nullable_narrowing_rejected_and_unknown_entity_error():
    """nullable → required narrowing of an EXISTING field must fail
    validation (existing null rows violate the new contract — the same
    break the required-ADD rule guards for new fields), and latest() of an
    unknown entity raises the module's error type, not bare IndexError."""
    import pytest

    from cdc_core_spark.registry import (SchemaDef, SchemaEvolutionError,
                                         SchemaRegistry, validate_evolution)

    old = SchemaDef("e", 1, 0, (
        {"name": "k", "type": "string", "nullable": False, "key": True},
        {"name": "x", "type": "string", "nullable": True}), {})
    new = SchemaDef("e", 1, 1, (
        {"name": "k", "type": "string", "nullable": False, "key": True},
        {"name": "x", "type": "string", "nullable": False}), {})
    with pytest.raises(SchemaEvolutionError, match="narrowed"):
        validate_evolution(old, new)

    reg = SchemaRegistry.from_docs([{
        "entity": "e", "major": 1, "minor": 0,
        "fields": [{"name": "k", "type": "string", "nullable": False,
                    "key": True}]}])
    with pytest.raises(SchemaEvolutionError, match="unknown entity"):
        reg.latest("typo_entity")
