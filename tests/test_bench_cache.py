"""Unit tests for bench.py's prepared-log cache + disk mirror.

The bench stages synthesized event logs in a tmpfs cache (volatile: a VM
restart wipes it) with a disk-persistent mirror. These tests pin the two
properties the graded run depends on:

- stamp-last copies: a crash mid-copy must read as a MISS, never as a
  corrupt hit (the stamp file is only written after the payload lands);
- restore-on-miss: a cold tmpfs cache with a current mirror restores
  transparently through ``_cache_lookup``.

They run against tiny fake "logs" (a batch=0 dir with one file) with the
cache/mirror roots monkeypatched to tmp dirs — no Spark, no real logs.
"""

import json
import os

import pytest

import bench


def _mk_log(root: str, kind: str, params: dict, payload: bytes) -> str:
    d = os.path.join(root, kind)
    os.makedirs(os.path.join(d, "batch=0"), exist_ok=True)
    with open(os.path.join(d, "batch=0", "part-0.parquet"), "wb") as f:
        f.write(payload)
    with open(os.path.join(d, "_stamp.json"), "w") as f:
        json.dump(params, f)
    return d


@pytest.fixture()
def roots(tmp_path, monkeypatch):
    cache = str(tmp_path / "tmpfs-cache")
    mirror = str(tmp_path / "disk-mirror")
    monkeypatch.setattr(bench, "CACHE_DIR", cache)
    monkeypatch.setattr(bench, "MIRROR_DIR", mirror)
    return cache, mirror


PARAMS = {"kind": "lc", "events": 1000, "seed": 42}


def test_stamp_matches_requires_payload(roots):
    cache, _ = roots
    d = os.path.join(cache, "lc")
    os.makedirs(d)
    with open(os.path.join(d, "_stamp.json"), "w") as f:
        json.dump(PARAMS, f)
    # stamp without batch=0 payload = incomplete = miss
    assert not bench._stamp_matches(d, PARAMS)
    os.makedirs(os.path.join(d, "batch=0"))
    assert bench._stamp_matches(d, PARAMS)
    assert not bench._stamp_matches(d, {**PARAMS, "events": 2000})


def test_copy_staged_writes_stamp_last(roots, tmp_path):
    cache, _ = roots
    src = _mk_log(cache, "lc", PARAMS, b"payload-bytes")
    dst = str(tmp_path / "dest")
    bench._copy_staged(src, dst)
    assert bench._stamp_matches(dst, PARAMS)
    with open(os.path.join(dst, "batch=0", "part-0.parquet"), "rb") as f:
        assert f.read() == b"payload-bytes"
    # the temp sibling must not linger
    assert not os.path.exists(dst + ".partial")


def test_mirror_save_then_cold_restore(roots):
    cache, mirror = roots
    _mk_log(cache, "lc", PARAMS, b"x" * 64)
    assert bench._mirror_save("lc", PARAMS) == os.path.join(mirror, "lc")
    # second save is a no-op
    assert bench._mirror_save("lc", PARAMS) == "current"
    # simulate the VM restart: tmpfs cache gone, mirror survives
    import shutil

    shutil.rmtree(cache)
    got = bench._cache_lookup("lc", PARAMS)
    assert got == os.path.join(cache, "lc")
    assert bench._stamp_matches(got, PARAMS)
    # and the restored copy is itself a plain tmpfs hit now
    assert bench._cache_lookup("lc", PARAMS) == got


def test_restore_misses_on_stale_mirror(roots):
    cache, mirror = roots
    _mk_log(mirror, "lc", {**PARAMS, "events": 7}, b"old")
    assert bench._cache_lookup("lc", PARAMS) is None


def test_mirror_save_without_source(roots):
    assert bench._mirror_save("lc", PARAMS) == "no-source"


def test_stale_generation_reclaimed_before_headroom(roots):
    """A destination holding only a stamp-mismatched old generation (plus
    a leftover .partial) must be reclaimed so the new save fits on a
    destination sized for one copy."""
    cache, mirror = roots
    _mk_log(cache, "lc", PARAMS, b"new-gen")
    _mk_log(mirror, "lc", {**PARAMS, "events": 7}, b"old-gen")
    os.makedirs(os.path.join(mirror, "lc.partial", "batch=0"))
    assert bench._mirror_save("lc", PARAMS) == os.path.join(mirror, "lc")
    assert bench._stamp_matches(os.path.join(mirror, "lc"), PARAMS)
    assert not os.path.exists(os.path.join(mirror, "lc.partial"))


def test_failed_restore_memoized(roots, monkeypatch):
    """A restore that fails must not re-walk the mirror on every
    subsequent lookup (budget probes call _cache_lookup in loops)."""
    cache, mirror = roots
    monkeypatch.setattr(bench, "_RESTORE_ATTEMPTED", set())
    _mk_log(mirror, "lc", PARAMS, b"x")
    calls = []
    real = bench._transfer

    def counting(*a, **k):
        calls.append(a)
        raise_dir = a[3]
        # simulate failure by pointing at an unwritable root
        return None

    monkeypatch.setattr(bench, "_transfer", counting)
    assert bench._cache_lookup("lc", PARAMS) is None
    assert bench._cache_lookup("lc", PARAMS) is None
    assert len(calls) == 1, "second lookup must hit the memo, not _transfer"


def test_compact_line_carries_value_source(roots, tmp_path):
    rep = bench._Reporter(str(tmp_path / "out.json"), 0.1, bench._Clock(10))
    rep.detail["value"] = 123.0
    rep.detail["value_source"] = "lc:4x2"
    rep.detail["elapsed_sec"] = 1.0
    line = rep._compact_line(final=True)
    import json as _json

    assert _json.loads(line)["value_source"] == "lc:4x2"


def test_crash_mid_copy_reads_as_miss(roots):
    """A partial dir without a stamp (what a crash between payload copy
    and stamp write leaves behind) must be invisible to lookup."""
    cache, mirror = roots
    d = os.path.join(mirror, "lc")
    os.makedirs(os.path.join(d, "batch=0"))
    with open(os.path.join(d, "batch=0", "part-0.parquet"), "wb") as f:
        f.write(b"half-written")
    # no _stamp.json
    assert bench._cache_lookup("lc", PARAMS) is None
