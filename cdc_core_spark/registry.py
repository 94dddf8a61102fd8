"""Versioned schema registry + evolution validator.

Re-expresses the reference's schema subsystem on StructType-like field lists:

* versioned per-entity schemas ``(entity, major, minor)`` with a
  domain→entity→version hierarchy and a driver-side cache, broadcast
  per-microbatch (reference: entity/.../manager/SchemaManager.java:282-396,
  SchemaVersion.java:26-72);
* field-wise diff → ADD / DROP / MODIFY / RENAME ops (reference:
  EntitySchema.diff, entity/.../schema/EntitySchema.java:305-325,
  EntityDiff.java:32-172, ESchemaOp.java:19-21);
* backward-compat validation: nullable ADD ok, required ADD without default
  is an error, type MODIFY allowed only for numeric widening
  int→long→float→double (reference:
  SchemaEvolutionValidator.java:122-186,543-555), DROP is a soft-delete
  (``ignoreDroppedColumn`` semantics, EntitySchema.java:419-431), RENAME must
  be declared in the alias map.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field


class SchemaEvolutionError(Exception):
    pass


# transitive widening closure per SchemaEvolutionValidator.java:543-555
WIDENING: set[tuple[str, str]] = {
    ("short", "int"), ("short", "long"), ("short", "float"), ("short", "double"),
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"),
    ("float", "double"),
}


@dataclass(frozen=True)
class SchemaDef:
    entity: str
    major: int
    minor: int
    fields: tuple          # tuple of dicts {name, type, nullable, key?}
    aliases: dict          # old_name -> new_name (cumulative)

    @property
    def version(self) -> str:
        return f"{self.major}.{self.minor}"

    def field_map(self) -> dict[str, dict]:
        return {f["name"]: f for f in self.fields}

    def key_cols(self) -> list[str]:
        return [f["name"] for f in self.fields if f.get("key")]


@dataclass
class SchemaOp:
    op: str        # ADD | DROP | MODIFY | RENAME | NARROW
    name: str
    detail: dict = field(default_factory=dict)


def diff(old: SchemaDef, new: SchemaDef) -> list[SchemaOp]:
    """Field-wise diff, rename-aware via the new version's alias map."""
    ops: list[SchemaOp] = []
    om, nm = old.field_map(), new.field_map()
    renames = {o: n for o, n in new.aliases.items() if o in om and n in nm and o not in nm}
    for old_name, new_name in renames.items():
        ops.append(SchemaOp("RENAME", old_name, {"to": new_name}))
    for name, f in nm.items():
        src = om.get(name) or (om.get(_rename_src(renames, name)) if _rename_src(renames, name) else None)
        if src is None:
            ops.append(SchemaOp("ADD", name, {"type": f["type"], "nullable": f.get("nullable", True)}))
        else:
            if src["type"] != f["type"]:
                ops.append(SchemaOp("MODIFY", name, {"from": src["type"], "to": f["type"]}))
            if src.get("nullable", True) and not f.get("nullable", True):
                # nullable -> required narrowing of an EXISTING field: must
                # surface as an op (existing null rows violate the new
                # contract) — the same break required-ADD-without-default
                # guards against for new fields
                ops.append(SchemaOp("NARROW", name, {}))
    for name in om:
        if name not in nm and name not in renames:
            ops.append(SchemaOp("DROP", name))
    return ops


def _rename_src(renames: dict, new_name: str) -> str | None:
    for o, n in renames.items():
        if n == new_name:
            return o
    return None


def validate_evolution(old: SchemaDef, new: SchemaDef) -> list[SchemaOp]:
    """Backward-compat check; raises SchemaEvolutionError on an illegal change.
    Returns the validated op list."""
    # key columns must never change — check first, it invalidates everything
    if old.key_cols() != new.key_cols():
        raise SchemaEvolutionError(f"key columns changed: {old.key_cols()} → {new.key_cols()}")
    ops = diff(old, new)
    for op in ops:
        if op.op == "ADD":
            f = new.field_map()[op.name]
            if not f.get("nullable", True) and f.get("default") is None:
                raise SchemaEvolutionError(
                    f"ADD of required field '{op.name}' without default "
                    "(SchemaEvolutionValidator: required-add w/o default = ERROR)")
        elif op.op == "MODIFY":
            pair = (op.detail["from"].lower(), op.detail["to"].lower())
            if pair not in WIDENING:
                raise SchemaEvolutionError(
                    f"MODIFY {op.name}: {pair[0]} → {pair[1]} is not a legal widening")
            if op.name in new.key_cols():
                # storage bucketing hashes the key's PHYSICAL type
                # (bucket_expr: xxhash64(int 7) != xxhash64(bigint 7)), so
                # a widened key re-hashes every existing key into a
                # different bucket — point lookups and bucket-pruned
                # merges would probe the new bucket and silently miss
                # every pre-widen row. Key types are frozen; the migration
                # path is an explicit full re-bucket (compact(n_buckets=))
                # under the new type, which is a rewrite, not an evolution.
                raise SchemaEvolutionError(
                    f"MODIFY {op.name}: key column types are frozen — "
                    f"widening re-hashes storage bucketing; migrate via an "
                    f"explicit re-bucket rewrite instead")
        elif op.op == "NARROW":
            raise SchemaEvolutionError(
                f"field '{op.name}' narrowed nullable → required: existing "
                "rows may hold nulls — widen back, or migrate with a "
                "default-fill rewrite first")
        # RENAME targets are present by construction (diff only emits
        # renames whose target exists in the new field map) — no check
        # needed here. DROP = soft-delete, always allowed
        # (ignoreDroppedColumn semantics)
    return ops


# Spark DDL simpleString → the registry's type lattice (DataType.java:31-72);
# decimal collapses to double and date to timestamp — the reference lattice
# has neither (SURVEY §1.2: only float/double, TIMESTAMP_* time types)
_SPARK_TO_LATTICE = {
    "boolean": "boolean", "smallint": "short", "tinyint": "short",
    "int": "int", "integer": "int", "bigint": "long",
    "float": "float", "double": "double", "string": "string",
    "binary": "binary", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "date": "timestamp",
}


def schema_from_struct(entity: str, struct, key_cols: list[str],
                       major: int = 1, minor: int = 0) -> SchemaDef:
    """Derive a versioned SchemaDef from a Spark StructType (the
    SchemaHelper/DbEntitySchema generation shape). Key columns are forced
    non-null regardless of source metadata — keys must be total in the
    entity model (IKey, common/.../model/entity/IKey.java:26-42)."""
    fields = []
    for f in struct.fields:
        t = f.dataType.simpleString()
        lt = "double" if t.startswith("decimal") else _SPARK_TO_LATTICE.get(t)
        if lt is None:
            raise SchemaEvolutionError(
                f"no lattice mapping for Spark type {t!r} (field {f.name})")
        is_key = f.name in key_cols
        fields.append({"name": f.name, "type": lt,
                       "nullable": bool(f.nullable) and not is_key,
                       **({"key": True} if is_key else {})})
    missing = [k for k in key_cols if k not in {f["name"] for f in fields}]
    if missing:
        raise SchemaEvolutionError(f"key columns absent from source: {missing}")
    return SchemaDef(entity=entity, major=major, minor=minor,
                     fields=tuple(fields), aliases={})


def from_jdbc(spark, url: str, table: str, key_cols: list[str],
              entity: str | None = None, properties: dict | None = None,
              major: int = 1, minor: int = 0) -> SchemaDef:
    """Schema generation from JDBC metadata — the JdbcSchemaGenerator /
    DbEntitySchema analog (entity/.../jdbc/JdbcSchemaGenerator.java,
    DbEntitySchema.java): Spark resolves the table's schema with a zero-row
    metadata query (no data is read), and the resulting StructType maps onto
    the registry's type lattice as a registrable versioned SchemaDef."""
    from cdc_core_spark.sources.readers import read_jdbc
    return schema_from_struct(entity or table,
                              read_jdbc(spark, url, table, properties).schema,
                              key_cols, major, minor)


class SchemaRegistry:
    """Driver-side registry cache; schemas are tiny and broadcast implicitly
    via the generated per-epoch projection expressions."""

    def __init__(self, defs: list[SchemaDef]):
        self._by_ver: dict[tuple[str, str], SchemaDef] = {
            (d.entity, d.version): d for d in defs
        }

    def register(self, sdef: SchemaDef) -> None:
        """Add/overwrite one versioned schema (SchemaManager.create/update
        analog — the distributed-lock concern collapses to the single
        driver owning the loop, SURVEY §2.5)."""
        self._by_ver[(sdef.entity, sdef.version)] = sdef

    @staticmethod
    def load(reg_dir: str) -> "SchemaRegistry":
        defs = []
        for p in sorted(glob.glob(os.path.join(reg_dir, "*", "*.json"))):
            with open(p) as f:
                doc = json.load(f)
            defs.append(SchemaRegistry._def_from_doc(doc))
        return SchemaRegistry(defs)

    @staticmethod
    def from_docs(docs: list[dict]) -> "SchemaRegistry":
        return SchemaRegistry([SchemaRegistry._def_from_doc(d) for d in docs])

    @staticmethod
    def _def_from_doc(doc: dict) -> SchemaDef:
        return SchemaDef(entity=doc["entity"], major=doc["major"], minor=doc["minor"],
                         fields=tuple(doc["fields"]), aliases=doc.get("aliases", {}))

    def get(self, entity: str, version: str) -> SchemaDef:
        try:
            return self._by_ver[(entity, version)]
        except KeyError:
            raise SchemaEvolutionError(f"unknown schema {entity}@{version}") from None

    def versions(self, entity: str) -> list[SchemaDef]:
        out = [d for (e, _), d in self._by_ver.items() if e == entity]
        return sorted(out, key=lambda d: (d.major, d.minor))

    def latest(self, entity: str) -> SchemaDef:
        vs = self.versions(entity)
        if not vs:
            # the module's error contract, not a bare IndexError
            raise SchemaEvolutionError(f"unknown entity {entity!r}")
        return vs[-1]
