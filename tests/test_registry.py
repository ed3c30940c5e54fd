"""Schema registry + wire-compatibility gate (X100, sources/registry.py).

Covers: the compatibility predicate itself (BACKWARD/FORWARD/FULL/NONE,
widening, nested containers), registration lifecycle (versioning,
fingerprint idempotence, rejection, retire), the per-row gate's split and
its chaining into parse_debezium_envelope, and the CAS serialization of
two registry handles over one root.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rap_etl_spark.sources.registry import (
    IncompatibleSchemaError,
    SchemaRegistry,
    check_compat,
    gate_envelopes,
)


def S(*fields):
    return T.StructType(list(fields))


def f(name, dt, nullable=True):
    return T.StructField(name, dt, nullable)


V1 = S(f("doc_id", T.StringType(), False), f("n_tok", T.IntegerType()))
V2_ADD_NULLABLE = S(
    f("doc_id", T.StringType(), False),
    f("n_tok", T.IntegerType()),
    f("lang", T.StringType(), True),
)
V2_ADD_REQUIRED = S(
    f("doc_id", T.StringType(), False),
    f("n_tok", T.IntegerType()),
    f("lang", T.StringType(), False),
)
V2_WIDEN = S(f("doc_id", T.StringType(), False), f("n_tok", T.LongType()))
V2_NARROW_FROM_WIDE = V1  # vs V2_WIDEN: long -> int
V2_DROP_NULLABLE = S(f("doc_id", T.StringType(), False))
V2_RETYPE = S(f("doc_id", T.StringType(), False), f("n_tok", T.StringType()))


# --- check_compat -----------------------------------------------------------


def test_backward_accepts_add_nullable_and_widen():
    assert check_compat(V1, V2_ADD_NULLABLE, "BACKWARD") == []
    assert check_compat(V1, V2_WIDEN, "BACKWARD") == []


def test_backward_rejects_required_add_and_narrow_and_retype():
    assert check_compat(V1, V2_ADD_REQUIRED, "BACKWARD")
    assert check_compat(V2_WIDEN, V2_NARROW_FROM_WIDE, "BACKWARD")
    assert check_compat(V1, V2_RETYPE, "BACKWARD")


def test_backward_accepts_drop_any():
    # new readers simply project dropped fields away
    assert check_compat(V1, V2_DROP_NULLABLE, "BACKWARD") == []


def test_forward_rejects_dropping_required_accepts_dropping_nullable():
    # old reader expects n_tok (nullable) -> reads NULL: fine
    assert check_compat(V1, V2_DROP_NULLABLE, "FORWARD") == []
    # old reader expects doc_id NOT NULL; new data lacks it: violation
    no_key = S(f("n_tok", T.IntegerType()))
    assert check_compat(V1, no_key, "FORWARD")


def test_forward_rejects_widening_but_accepts_additions():
    # new writes long, old reader has int: cannot read
    assert check_compat(V1, V2_WIDEN, "FORWARD")
    assert check_compat(V1, V2_ADD_REQUIRED, "FORWARD") == []


def test_full_is_conjunction_none_is_empty():
    assert check_compat(V1, V2_ADD_NULLABLE, "FULL") == []
    assert check_compat(V1, V2_WIDEN, "FULL")  # forward half rejects
    assert check_compat(V1, V2_RETYPE, "NONE") == []
    with pytest.raises(ValueError):
        check_compat(V1, V2_WIDEN, "SIDEWAYS")


def test_compat_recurses_containers():
    old = S(
        f("doc_id", T.StringType(), False),
        f("tokens", T.ArrayType(T.IntegerType())),
        f("meta", S(f("a", T.IntegerType()))),
        f("m", T.MapType(T.StringType(), T.IntegerType())),
    )
    widened = S(
        f("doc_id", T.StringType(), False),
        f("tokens", T.ArrayType(T.LongType())),
        f("meta", S(f("a", T.LongType()), f("b", T.StringType(), True))),
        f("m", T.MapType(T.StringType(), T.LongType())),
    )
    assert check_compat(old, widened, "BACKWARD") == []
    assert check_compat(widened, old, "BACKWARD")  # narrowing inside array
    bad_nested = S(
        f("doc_id", T.StringType(), False),
        f("tokens", T.ArrayType(T.IntegerType())),
        f("meta", S(f("a", T.IntegerType()), f("b", T.StringType(), False))),
        f("m", T.MapType(T.StringType(), T.IntegerType())),
    )
    assert check_compat(old, bad_nested, "BACKWARD")  # required nested add
    key_change = S(
        f("doc_id", T.StringType(), False),
        f("tokens", T.ArrayType(T.IntegerType())),
        f("meta", S(f("a", T.IntegerType()))),
        f("m", T.MapType(T.IntegerType(), T.IntegerType())),
    )
    assert check_compat(old, key_change, "BACKWARD")  # map key type change


# --- registry lifecycle -----------------------------------------------------


def test_register_versions_and_idempotence(tmp_path):
    r = SchemaRegistry(str(tmp_path / "reg"))
    assert r.register("docs", V1) == 1
    assert r.register("docs", V2_ADD_NULLABLE) == 2
    # same fingerprint -> same version, no new entry
    assert r.register("docs", V1) == 1
    assert r.versions("docs") == [1, 2]
    v, latest = r.latest("docs")
    assert v == 2 and latest == V2_ADD_NULLABLE
    assert r.get("docs", 1) == V1
    assert r.compat_mode("docs") == "BACKWARD"


def test_register_rejects_incompatible_with_violation_list(tmp_path):
    r = SchemaRegistry(str(tmp_path / "reg"))
    r.register("docs", V1)
    with pytest.raises(IncompatibleSchemaError) as ei:
        r.register("docs", V2_ADD_REQUIRED)
    assert "lang" in "".join(ei.value.violations)
    assert r.versions("docs") == [1]  # nothing appended


def test_register_mode_switch_and_none(tmp_path):
    r = SchemaRegistry(str(tmp_path / "reg"))
    r.register("docs", V1, mode="NONE")
    assert r.register("docs", V2_RETYPE) == 2  # NONE lets anything in
    assert r.compat_mode("docs") == "NONE"


def test_retire_excludes_from_latest_and_accepted(tmp_path):
    r = SchemaRegistry(str(tmp_path / "reg"))
    r.register("docs", V1)
    r.register("docs", V2_ADD_NULLABLE)
    r.retire("docs", 2)
    v, latest = r.latest("docs")
    assert v == 1 and latest == V1
    assert set(r.accepted_versions("docs")) == {1}
    with pytest.raises(KeyError):
        r.retire("docs", 9)


def test_compat_checks_against_latest_live_after_retire(tmp_path):
    # retiring v2 means a new registration is checked against v1
    r = SchemaRegistry(str(tmp_path / "reg"))
    r.register("docs", V1)
    r.register("docs", V2_WIDEN)
    r.retire("docs", 2)
    # int->long widen again from v1's int: fine (would also be fine vs v2)
    assert r.register("docs", V2_ADD_NULLABLE) == 3


def test_two_handles_share_one_root(tmp_path):
    a = SchemaRegistry(str(tmp_path / "reg"))
    b = SchemaRegistry(str(tmp_path / "reg"))
    assert a.register("docs", V1) == 1
    assert b.register("docs", V2_ADD_NULLABLE) == 2
    assert a.versions("docs") == [1, 2]


def test_bad_topic_name_rejected(tmp_path):
    r = SchemaRegistry(str(tmp_path / "reg"))
    with pytest.raises(ValueError):
        r.register("../escape", V1)


# --- the per-row gate -------------------------------------------------------


def _wire(spark):
    """Six wire rows: versions 1,1,2,3(unregistered),NULL,2."""
    rows = [
        ('{"op":"c","after":{"doc_id":"a","n_tok":3}}', 1),
        ('{"op":"c","after":{"doc_id":"b","n_tok":4}}', 1),
        ('{"op":"c","after":{"doc_id":"c","n_tok":5,"lang":"en"}}', 2),
        ('{"op":"c","after":{"doc_id":"d","n_tok":6}}', 3),
        ('{"op":"c","after":{"doc_id":"e","n_tok":7}}', None),
        ('{"op":"c","after":{"doc_id":"f","n_tok":8,"lang":"de"}}', 2),
    ]
    return spark.createDataFrame(
        rows, "env STRING, schema_version INT"
    )


def test_gate_splits_by_registry(tmp_path, spark):
    r = SchemaRegistry(str(tmp_path / "reg"))
    r.register("docs", V1)
    r.register("docs", V2_ADD_NULLABLE)
    good, dead = gate_envelopes(_wire(spark), r, "docs")
    import json as _json

    g = {
        _json.loads(x["env"])["after"]["doc_id"] for x in good.collect()
    }
    assert g == {"a", "b", "c", "f"}
    reasons = {x["dlq_reason"] for x in dead.collect()}
    assert reasons == {"unregistered_schema:3", "missing_field:schema_version"}
    # resolved reader DDL matches each row's declared version
    ddls = dict(
        good.select("schema_version", "_schema_ddl").distinct().collect()
    )
    assert "lang" not in ddls[1] and "lang" in ddls[2]


def test_gate_quarantines_retired(tmp_path, spark):
    r = SchemaRegistry(str(tmp_path / "reg"))
    r.register("docs", V1)
    r.register("docs", V2_ADD_NULLABLE)
    r.retire("docs", 1)
    good, dead = gate_envelopes(_wire(spark), r, "docs")
    assert good.count() == 2  # only the v2 rows
    assert "retired_schema:1" in {x["dlq_reason"] for x in dead.collect()}


def test_gate_with_empty_registry_quarantines_all(tmp_path, spark):
    r = SchemaRegistry(str(tmp_path / "reg"))
    good, dead = gate_envelopes(_wire(spark), r, "docs")
    assert good.count() == 0
    assert dead.count() == 6


def test_gate_chains_into_envelope_parse(tmp_path, spark):
    """Accepted rows parse with their resolved version DDL and land in the
    engine's change-event shape — the full wire->gate->decode path."""
    from rap_etl_spark.operators.cdc import parse_debezium_envelope

    r = SchemaRegistry(str(tmp_path / "reg"))
    r.register("docs", V1)
    r.register("docs", V2_ADD_NULLABLE)
    good, _ = gate_envelopes(_wire(spark), r, "docs")
    _, latest = r.latest("docs")
    ddl = latest.simpleString()[7:-1]
    parsed = parse_debezium_envelope(good, "env", ddl)
    rows = {x["doc_id"]: x for x in parsed.collect()}
    assert set(rows) == {"a", "b", "c", "f"}
    assert rows["c"]["lang"] == "en" and rows["a"]["lang"] is None
    assert rows["a"]["op"] == "I"


# --- pure-Python DDL parser (CLI path, no JVM) ------------------------------


def test_ddl_to_struct_roundtrips_forms():
    from rap_etl_spark.sources.registry import ddl_to_struct

    s = ddl_to_struct("doc_id STRING NOT NULL, price_c BIGINT")
    assert s == S(f("doc_id", T.StringType(), False), f("price_c", T.LongType()))
    # colon form + nesting, matching what the gate emits back as DDL
    s2 = ddl_to_struct(
        "doc_id:string,tokens:array<int>,meta:struct<a:bigint,b:string>,"
        "m:map<string,double>"
    )
    assert s2["tokens"].dataType == T.ArrayType(T.IntegerType())
    assert s2["meta"].dataType["a"].dataType == T.LongType()
    assert s2["m"].dataType == T.MapType(T.StringType(), T.DoubleType())
    # simpleString round-trip: parse(simpleString(x)) == x
    assert ddl_to_struct(s2.simpleString()[7:-1]) == s2
    # space form whose type contains ONLY nested colons must not be
    # routed to the colon-split branch
    s3 = ddl_to_struct("meta struct<a:int,b:string>")
    assert s3["meta"].dataType["a"].dataType == T.IntegerType()
    assert s3["meta"].dataType["b"].dataType == T.StringType()
    s4 = ddl_to_struct("m map<string,struct<x:int>> NOT NULL")
    assert not s4["m"].nullable
    with pytest.raises(ValueError):
        ddl_to_struct("x mystery_type")


def test_cli_registry_lifecycle(tmp_path, capsys):
    from rap_etl_spark.cli import main

    root = str(tmp_path / "reg")
    assert main(
        ["registry", "register", "--root", root, "--topic", "docs",
         "--ddl", "doc_id STRING NOT NULL, price_c BIGINT"]
    ) == 0
    assert main(
        ["registry", "register", "--root", root, "--topic", "docs",
         "--ddl", "doc_id STRING NOT NULL, price_c BIGINT, lang STRING"]
    ) == 0
    # narrowing bigint -> int refused under BACKWARD, rc=3 + violations
    assert main(
        ["registry", "register", "--root", root, "--topic", "docs",
         "--ddl", "doc_id STRING NOT NULL, price_c INT"]
    ) == 3
    assert main(
        ["registry", "retire", "--root", root, "--topic", "docs",
         "--version", "2"]
    ) == 0
    assert main(["registry", "list", "--root", root, "--topic", "docs"]) == 0
    import json as _json

    out = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert out[0] == {"topic": "docs", "version": 1}
    assert out[2]["error"] == "incompatible"
    doc = out[-1]
    assert [v["live"] for v in doc["versions"]] == [True, False]


def test_cli_registry_missing_required_flags_exit_cleanly(tmp_path):
    """register without --ddl / retire without --version must be a clean
    usage error (SystemExit), not an unhandled TypeError inside the
    parser."""
    from rap_etl_spark.cli import main

    root = str(tmp_path / "reg")
    with pytest.raises(SystemExit):
        main(["registry", "register", "--root", root, "--topic", "docs"])
    with pytest.raises(SystemExit):
        main(["registry", "retire", "--root", root, "--topic", "docs"])
