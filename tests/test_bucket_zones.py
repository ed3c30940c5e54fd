"""Pure-Python property tests for the bucket-zone algebra behind
split_buckets/merge_buckets (lake._BucketZones, _closure_split,
_fold_modulus). Ground truth by CRT: zones (b1 mod n1) and (b2 mod n2)
share a key hash iff b1 ≡ b2 (mod gcd(n1, n2)). The safety contract is
one-sided: `hits` may over-match (conservative read/rewrite) but must
NEVER under-match — a missed overlap loses rows."""

import math
import random

from rap_etl_spark.lake import (
    _BucketZones,
    _closure_split,
    _entry_nb,
    _fold_modulus,
)


def crt_overlap(b1, n1, b2, n2):
    return b1 % math.gcd(n1, n2) == b2 % math.gcd(n1, n2)


def chain_moduli(rng, base=None, depth=3):
    """A divisibility chain like real table lifecycles produce."""
    n = base or rng.choice([2, 4, 8])
    out = [n]
    for _ in range(depth):
        n *= rng.choice([2, 2, 3])
        out.append(n)
    return out


def test_hits_exact_on_divisibility_chains():
    rng = random.Random(11)
    for _ in range(300):
        mods = chain_moduli(rng)
        zones = []
        for _ in range(rng.randrange(1, 5)):
            n = rng.choice(mods)
            zones.append((rng.randrange(n), n))
        z = _BucketZones(zones)
        for _ in range(20):
            fn = rng.choice(mods)
            fe = {"bucket": rng.randrange(fn), "nb": fn}
            want = any(crt_overlap(fe["bucket"], fn, b, n) for b, n in zones)
            # on a chain, gcd(n1,n2) = min(n1,n2) and hits is EXACT
            assert z.hits(fe, max(mods)) == want, (zones, fe)


def test_hits_never_under_matches_off_chain():
    rng = random.Random(12)
    for _ in range(300):
        zones = []
        for _ in range(rng.randrange(1, 5)):
            n = rng.choice([2, 3, 4, 6, 8, 9, 12, 16])
            zones.append((rng.randrange(n), n))
        z = _BucketZones(zones)
        for _ in range(20):
            fn = rng.choice([2, 3, 4, 6, 8, 9, 12, 16])
            fe = {"bucket": rng.randrange(fn), "nb": fn}
            if any(crt_overlap(fe["bucket"], fn, b, n) for b, n in zones):
                assert z.hits(fe, 16), (zones, fe)  # no false negative, ever


def test_closure_is_closed_and_covers_seed():
    rng = random.Random(13)
    for _ in range(200):
        mods = chain_moduli(rng)
        files = []
        for i in range(rng.randrange(2, 30)):
            n = rng.choice(mods)
            files.append({"path": f"f{i}", "bucket": rng.randrange(n), "nb": n})
        nb = max(mods)
        seed = {(rng.randrange(nb), nb)}
        hit, miss = _closure_split(files, _BucketZones(seed), nb)
        assert {f["path"] for f in hit} | {f["path"] for f in miss} == {
            f["path"] for f in files
        }
        # closed: no hit file's zone overlaps any miss file's zone
        for h in hit:
            for m in miss:
                assert not crt_overlap(h["bucket"], h["nb"], m["bucket"], m["nb"])
        # covers the seed: every file overlapping the seed zone is hit
        (sb, sn), = seed
        for m in miss:
            assert not crt_overlap(m["bucket"], m["nb"], sb, sn)


def test_fold_groups_are_key_closed():
    rng = random.Random(14)
    for _ in range(200):
        mods = chain_moduli(rng)
        files = []
        for i in range(rng.randrange(2, 30)):
            n = rng.choice(mods)
            files.append({"path": f"f{i}", "bucket": rng.randrange(n), "nb": n})
        fold = _fold_modulus(files, max(mods))
        for a in files:
            for b in files:
                if crt_overlap(a["bucket"], a["nb"], b["bucket"], b["nb"]):
                    assert a["bucket"] % fold == b["bucket"] % fold


def test_entry_nb_defaults():
    assert _entry_nb({"bucket": 1}, 8) == 8
    assert _entry_nb({"bucket": 1, "nb": 4}, 8) == 4
    assert _entry_nb({"bucket": 1, "nb": None}, 8) == 8
    assert _entry_nb({"bucket": 1, "nb": "x"}, 8) == 8
