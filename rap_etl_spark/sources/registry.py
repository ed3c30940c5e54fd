"""Schema registry + wire-compatibility gate for envelope ingestion (X100).

Every real CDC deployment puts a schema registry between producers and the
ingest tail (Confluent Schema Registry / Apicurio for Debezium topics): a
producer REGISTERS its payload schema before producing, the registry
rejects registrations that violate the topic's compatibility mode, and
each wire message carries the schema version it was written under so
consumers can decode it with the right reader schema and quarantine
messages stamped with versions the registry never accepted.

This module is that seam for the rap-etl engine, built from public
Confluent/Avro compatibility semantics re-expressed over Spark SQL struct
schemas:

- ``SchemaRegistry`` — file-backed (fsio seam, so POSIX and the
  object-store backend both work), one JSON doc per topic holding the
  ordered version list + the topic's compat mode. Registration is
  CAS-guarded (``commit_lock``) so two concurrent producers can't both
  append version N+1, and idempotent: re-registering a schema whose
  canonical fingerprint already exists returns the existing version —
  exactly Confluent's POST /subjects behavior.
- ``check_compat(old, new, mode)`` — the compatibility predicate:

  * BACKWARD (default, Confluent's default): a consumer on the NEW schema
    can read rows produced under OLD. Fields added by new must be
    nullable (they read as NULL from old rows); shared fields may keep
    their type or widen old→new (int32→int64, float→double — the same
    ``lake._is_widening`` promotion the table's own evolution allows, so
    registry legality and table legality can never disagree); fields
    dropped by new are legal (consumers just project them away).
  * FORWARD: a consumer still on OLD can read rows produced under NEW —
    the mirror image: new may drop only nullable fields, may not narrow,
    and additions are unrestricted (old readers ignore them).
  * FULL: both. NONE: anything goes.

  Checks recurse through array elements, map values, and nested structs.
  Returns the violation list (empty = compatible) so callers can surface
  WHY a registration was refused; ``register`` raises
  ``IncompatibleSchemaError`` carrying it.

- ``gate_envelopes(df, registry, topic, version_col)`` — the per-row
  ingest gate: classify each wire row by its declared schema version
  against the topic's accepted set. Unknown versions (a producer that
  skipped registration, or a fat-fingered id) and retired versions get a
  ``dlq_reason`` in the same vocabulary as ``cdc.split_dlq``, so the
  gate chains straight into the X89 quarantine path; accepted rows pass
  through with a resolved ``_schema_ddl`` the caller can hand to
  ``parse_debezium_envelope``. The accepted set is O(versions) and
  travels as a broadcast literal map — the gate is a narrow projection,
  zero exchanges, nothing per-row in Python.

Scale: the registry document is O(versions) bytes and read once per
batch on the driver; the per-row work is one JVM map lookup inside the
scan stage. At 10^10 events nothing here appears in any shuffle.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.fsio import PosixFS, TableFS
from rap_etl_spark.lake import _is_widening

COMPAT_MODES = ("BACKWARD", "FORWARD", "FULL", "NONE")


_SCALARS = {
    "string": T.StringType(),
    "varchar": T.StringType(),
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at angle-bracket nesting depth 0."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _parse_type(s: str) -> T.DataType:
    s = s.strip()
    low = s.lower()
    if low in _SCALARS:
        return _SCALARS[low]
    if low.startswith("array<") and s.endswith(">"):
        return T.ArrayType(_parse_type(s[6:-1]))
    if low.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[4:-1])
        return T.MapType(_parse_type(k), _parse_type(v))
    if low.startswith("struct<") and s.endswith(">"):
        return ddl_to_struct(s[7:-1])
    if low.startswith("decimal"):
        import re as _re

        m = _re.match(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", low)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType(10, 0)
    raise ValueError(f"cannot parse type {s!r}")


def ddl_to_struct(ddl: str) -> T.StructType:
    """Minimal pure-Python DDL parser (``name TYPE [NOT NULL], ...``, both
    the ``name: type`` and ``name type`` forms, nested
    array/map/struct<...>), so the registry CLI can register schemas
    WITHOUT paying a JVM startup — StructType.fromDDL needs a live
    SparkContext. Parsed results round-trip through simpleString to the
    exact DDL the gate hands parse_debezium_envelope."""
    fields = []
    for part in _split_top(ddl):
        part = part.strip()
        if not part:
            continue
        nullable = True
        low = part.lower()
        if low.endswith("not null"):
            nullable = False
            part = part[: -len("not null")].strip()
        # colon form iff a TOP-LEVEL colon exists — `meta struct<a:int>`
        # has only nested colons and must take the space-form branch
        # (checking `":" in first-segment` inverts exactly that case)
        if len(_split_top(part, ":")) > 1:
            name, ty = part.split(":", 1)
        else:
            name, ty = part.split(None, 1)
        fields.append(T.StructField(name.strip(), _parse_type(ty), nullable))
    return T.StructType(fields)


class IncompatibleSchemaError(ValueError):
    """New schema violates the topic's compatibility mode. Carries the
    violation list in ``.violations``."""

    def __init__(self, topic: str, mode: str, violations: list[str]):
        super().__init__(
            f"schema incompatible with topic {topic!r} under {mode}: "
            + "; ".join(violations)
        )
        self.violations = violations


def _fingerprint(schema: T.StructType) -> str:
    """Canonical fingerprint: sha256 of the sorted-key JSON of the schema.
    StructType.jsonValue() is deterministic field-order-preserving; field
    ORDER is significant (a reordered schema is a different version, as in
    Avro canonical form the field list is ordered)."""
    return hashlib.sha256(
        json.dumps(schema.jsonValue(), sort_keys=True).encode()
    ).hexdigest()[:32]


def _read_compatible(writer: T.DataType, reader: T.DataType) -> bool:
    """Can a value written as `writer` be read as `reader`? Identity or
    promotion (the table's own widening rules), recursing through
    containers. Struct recursion applies BACKWARD field rules with the
    writer as old."""
    if writer == reader:
        return True
    if _is_widening(writer, reader):
        return True
    if isinstance(writer, T.ArrayType) and isinstance(reader, T.ArrayType):
        return _read_compatible(writer.elementType, reader.elementType)
    if isinstance(writer, T.MapType) and isinstance(reader, T.MapType):
        return writer.keyType == reader.keyType and _read_compatible(
            writer.valueType, reader.valueType
        )
    if isinstance(writer, T.StructType) and isinstance(reader, T.StructType):
        return not _backward_violations(writer, reader, prefix="")
    return False


def _backward_violations(
    old: T.StructType, new: T.StructType, prefix: str = ""
) -> list[str]:
    """Violations of: a reader on `new` can read rows written under `old`."""
    out: list[str] = []
    old_by_name = {f.name: f for f in old.fields}
    for f in new.fields:
        path = prefix + f.name
        o = old_by_name.get(f.name)
        if o is None:
            if not f.nullable:
                out.append(f"added field {path} must be nullable")
        elif not _read_compatible(o.dataType, f.dataType):
            out.append(
                f"field {path}: cannot read {o.dataType.simpleString()} "
                f"as {f.dataType.simpleString()}"
            )
    return out


def check_compat(
    old: T.StructType, new: T.StructType, mode: str = "BACKWARD"
) -> list[str]:
    """Compatibility violations of `new` vs the latest `old` under `mode`
    (empty list = compatible). See module docstring for the semantics."""
    if mode not in COMPAT_MODES:
        raise ValueError(f"unknown compat mode {mode!r} (use {COMPAT_MODES})")
    if mode == "NONE":
        return []
    out: list[str] = []
    if mode in ("BACKWARD", "FULL"):
        out += _backward_violations(old, new)
    if mode in ("FORWARD", "FULL"):
        # old readers on new data = BACKWARD with the roles swapped, and
        # the violation text re-oriented to the forward direction
        out += [
            v.replace("added field", "dropped/required field").replace(
                "cannot read", "old reader cannot read"
            )
            for v in _backward_violations(new, old)
        ]
    return out


class SchemaRegistry:
    """File-backed per-topic schema registry (see module docstring).

    Layout: ``<root>/<topic>.json`` = ``{"compat": mode, "versions":
    [{"v": 1, "fingerprint": ..., "schema": <StructType json>,
    "retired": false}, ...]}``. Versions are 1-based and append-only;
    ``retire`` flips a flag (messages stamped with a retired version are
    quarantined at the gate) rather than deleting history.
    """

    def __init__(self, root: str, fs: TableFS | None = None):
        self.root = root.rstrip("/")
        self.fs = fs or PosixFS()
        self.fs.makedirs(self.root)

    def _path(self, topic: str) -> str:
        if "/" in topic or topic.startswith("."):
            raise ValueError(f"bad topic name {topic!r}")
        return f"{self.root}/{topic}.json"

    def _lock(self, topic: str) -> str:
        # commit_lock takes a SIDECAR path: PosixFS opens the lock target
        # with truncating "w" (the lake does the same), so locking the
        # registry doc itself would erase it
        return self._path(topic) + ".lock"

    def _load(self, topic: str) -> dict:
        p = self._path(topic)
        if not self.fs.exists(p):
            return {"compat": "BACKWARD", "versions": []}
        return json.loads(self.fs.read_text(p))

    def _store(self, topic: str, doc: dict) -> None:
        self.fs.write_text_atomic(self._path(topic), json.dumps(doc, indent=1))

    # -- producer surface ---------------------------------------------------

    def register(
        self, topic: str, schema: T.StructType, mode: str | None = None
    ) -> int:
        """Register `schema` for `topic`; returns its version. Idempotent on
        fingerprint; raises IncompatibleSchemaError when the topic's compat
        mode rejects it. CAS-guarded: load→check→append runs under the
        registry file's commit lock so concurrent producers serialize."""
        fp = _fingerprint(schema)
        with self.fs.commit_lock(self._lock(topic)):
            doc = self._load(topic)
            if mode is not None:
                if mode not in COMPAT_MODES:
                    raise ValueError(f"unknown compat mode {mode!r}")
                doc["compat"] = mode
            for v in doc["versions"]:
                if v["fingerprint"] == fp:
                    if mode is not None:
                        self._store(topic, doc)
                    return v["v"]
            live = [v for v in doc["versions"] if not v.get("retired")]
            if live:
                latest = T.StructType.fromJson(live[-1]["schema"])
                violations = check_compat(latest, schema, doc["compat"])
                if violations:
                    raise IncompatibleSchemaError(
                        topic, doc["compat"], violations
                    )
            doc["versions"].append(
                {
                    "v": len(doc["versions"]) + 1,
                    "fingerprint": fp,
                    "schema": schema.jsonValue(),
                    "retired": False,
                }
            )
            self._store(topic, doc)
            return doc["versions"][-1]["v"]

    def retire(self, topic: str, version: int) -> None:
        """Retire a version: the gate quarantines messages stamped with it
        from now on. History is kept (audit + un-retire)."""
        with self.fs.commit_lock(self._lock(topic)):
            doc = self._load(topic)
            for v in doc["versions"]:
                if v["v"] == version:
                    v["retired"] = True
                    self._store(topic, doc)
                    return
            raise KeyError(f"{topic} has no version {version}")

    # -- consumer surface ---------------------------------------------------

    def versions(self, topic: str) -> list[int]:
        return [v["v"] for v in self._load(topic)["versions"]]

    def compat_mode(self, topic: str) -> str:
        return self._load(topic)["compat"]

    def get(self, topic: str, version: int) -> T.StructType:
        for v in self._load(topic)["versions"]:
            if v["v"] == version:
                return T.StructType.fromJson(v["schema"])
        raise KeyError(f"{topic} has no version {version}")

    def latest(self, topic: str) -> tuple[int, T.StructType]:
        live = [
            v for v in self._load(topic)["versions"] if not v.get("retired")
        ]
        if not live:
            raise KeyError(f"{topic} has no live versions")
        return live[-1]["v"], T.StructType.fromJson(live[-1]["schema"])

    def accepted_versions(self, topic: str) -> dict[int, T.StructType]:
        """Live (non-retired) versions — the gate's accept set."""
        return {
            v["v"]: T.StructType.fromJson(v["schema"])
            for v in self._load(topic)["versions"]
            if not v.get("retired")
        }


def gate_envelopes(
    df: DataFrame,
    registry: SchemaRegistry,
    topic: str,
    version_col: str = "schema_version",
) -> tuple[DataFrame, DataFrame]:
    """Per-row registry gate: split `df` into (accepted, quarantined) by the
    declared writer-schema version. Quarantined rows carry ``dlq_reason``
    in split_dlq's vocabulary (``unregistered_schema:<v>`` /
    ``retired_schema:<v>`` / ``missing_field:<version_col>``) so they feed
    the same X89 quarantine sink; accepted rows gain ``_schema_ddl`` — the
    resolved reader DDL for that version — consumable by
    ``parse_debezium_envelope`` per version group.

    The accept/retire sets are O(versions) literal arrays folded into the
    scan-stage projection: zero exchanges, zero Python per row.
    """
    doc_versions = registry._load(topic)["versions"]
    accepted = {
        v["v"]: T.StructType.fromJson(v["schema"]).simpleString()[7:-1]
        for v in doc_versions
        if not v.get("retired")
    }
    retired = [v["v"] for v in doc_versions if v.get("retired")]
    vc = F.col(version_col)
    reason = F.when(vc.isNull(), f"missing_field:{version_col}")
    for rv in retired:
        reason = reason.when(vc == rv, f"retired_schema:{rv}")
    if accepted:
        reason = reason.when(
            ~vc.isin(*accepted), F.concat(F.lit("unregistered_schema:"), vc)
        )
    else:
        reason = reason.otherwise(
            F.concat(F.lit("unregistered_schema:"), vc)
        )
    ddl = F.lit(None).cast("string")
    for v, d in accepted.items():
        ddl = F.when(vc == v, d).otherwise(ddl)
    tagged = df.withColumn("dlq_reason", reason)
    good = tagged.filter(F.col("dlq_reason").isNull()).drop("dlq_reason")
    good = good.withColumn("_schema_ddl", ddl)
    dead = tagged.filter(F.col("dlq_reason").isNotNull())
    return good, dead
