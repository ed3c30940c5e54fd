"""Model-based interaction test: random interleavings of EVERY mutating
table operation (version-conditional merge upserts/deletes, tombstone and
deletion-vector DML, scrub updates, and the full maintenance surface)
applied both to a real ManifestParquetTable and to a plain-Python
reference model, with state equality asserted after every step.

Single-feature tests prove each operator alone; the bugs that survive
them live in cross-feature interactions (round-3 example: DV deletes
invisible to the changefeed's path-only bucket signature). Randomized
sequences walk those interactions systematically. Seeds are FIXED — a
failure is reproducible from the test id alone.

Reference semantics encoded (from lake.py's documented contracts):
- merge upsert at lsn: applies iff key absent or lsn > stored lsn
  (globally unique LSNs per run keep ties out of scope — tie semantics
  are pinned by dedicated tests).
- merge delete at lsn: tombstone carrying the DELETING lsn iff it wins;
  key invisible but an event with a higher lsn resurrects it.
- delete_where (cow/mor): tombstone keeping the ROW'S OWN lsn (GDPR
  erasure — LWW order survives, an older replay cannot resurrect).
- delete_where (dv): the key's every physical version vanishes with NO
  marker — any later merge event re-inserts it.
- update_where: live matching rows mutate payload, keep their lsn.
- compact / materialize_deltas / rewrite_deletion_vectors /
  split_buckets / merge_buckets / expire_snapshots: no logical change.
"""

import random

import pytest
from pyspark.sql import types as T

from rap_etl_spark.lake import ManifestParquetTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("src", T.StringType()),
    ]
)

KEYS = [f"k{i:02d}" for i in range(24)]


class Model:
    """entries: key -> (lsn, deleted, val, src)"""

    def __init__(self):
        self.e: dict[str, tuple[int, bool, int | None, str | None]] = {}

    def upsert(self, k, lsn, val, src):
        cur = self.e.get(k)
        if cur is None or lsn > cur[0]:
            self.e[k] = (lsn, False, val, src)

    def delete_event(self, k, lsn):
        cur = self.e.get(k)
        if cur is None or lsn > cur[0]:
            self.e[k] = (lsn, True, None, None)

    def delete_where_tombstone(self, pred):
        for k, (lsn, dead, val, src) in list(self.e.items()):
            if not dead and pred(val, src):
                self.e[k] = (lsn, True, None, None)

    def delete_where_dv(self, pred):
        for k, (lsn, dead, val, src) in list(self.e.items()):
            if not dead and pred(val, src):
                del self.e[k]

    def update_where(self, pred, new_src):
        for k, (lsn, dead, val, src) in list(self.e.items()):
            if not dead and pred(val, src):
                self.e[k] = (lsn, False, val, new_src)

    def live(self):
        return {
            k: (val, src)
            for k, (lsn, dead, val, src) in self.e.items()
            if not dead
        }


def _table_state(t):
    return {r["doc_id"]: (r["val"], r["src"]) for r in t.read().collect()}


def _run_sequence(spark, tmp_path, seed, n_ops=10):
    rng = random.Random(seed)
    mode = rng.choice(["cow", "mor"])
    t = ManifestParquetTable.create(
        spark, str(tmp_path / f"t{seed}"), SCHEMA, n_buckets=4, merge_mode=mode
    )
    model = Model()
    lsns = iter(rng.sample(range(1, 10_000_000), 2000))
    batch = iter(range(1, 100_000))
    trace = []

    def do_merge():
        ks = rng.sample(KEYS, rng.randint(1, 8))
        rows, desc = [], []
        for k in ks:
            lsn = next(lsns)
            if rng.random() < 0.25:
                rows.append((k, lsn, None, None, "D"))
                model.delete_event(k, lsn)
                desc.append(f"D:{k}@{lsn}")
            else:
                val, src = rng.randint(-50, 50), rng.choice("abc")
                rows.append((k, lsn, val, src, "U"))
                model.upsert(k, lsn, val, src)
                desc.append(f"U:{k}@{lsn}")
        df = spark.createDataFrame(
            rows, "doc_id string, lsn long, val long, src string, op string"
        )
        t.merge(df, batch_id=next(batch))
        return "merge " + ",".join(desc)

    def do_dv():
        lo = rng.randint(-50, 30)
        t.delete_where(f"val >= {lo} and val < {lo + 20}", mode="dv",
                       batch_id=next(batch))
        model.delete_where_dv(lambda v, s: v is not None and lo <= v < lo + 20)
        return f"dv_delete [{lo},{lo + 20})"

    def do_tombstone():
        src = rng.choice("abc")
        t.delete_where(f"src = '{src}'", batch_id=next(batch))
        model.delete_where_tombstone(lambda v, s: s == src)
        return f"tombstone_delete src={src}"

    def do_update():
        hi = rng.randint(-30, 50)
        t.update_where(f"val > {hi}", {"src": "'scrub'"},
                       batch_id=next(batch))
        model.update_where(lambda v, s: v is not None and v > hi, "scrub")
        return f"update val>{hi} src=scrub"

    def do_maint():
        op = rng.choice(
            ["compact", "materialize", "rewrite_dv", "split", "expire"]
        )
        if op == "compact":
            t.compact()
        elif op == "materialize":
            t.materialize_deltas()
        elif op == "rewrite_dv":
            t.rewrite_deletion_vectors(min_deleted_ratio=0.0)
        elif op == "split":
            t.split_buckets(2)
        else:
            t.expire_snapshots(keep=2, orphan_grace_sec=0.0)
        return f"maint:{op}"

    ops = [do_merge] * 5 + [do_dv, do_tombstone, do_update, do_maint, do_maint]
    for i in range(n_ops):
        desc = rng.choice(ops)()
        trace.append(desc)
        got, want = _table_state(t), model.live()
        assert got == want, (
            f"divergence after step {i} ({desc});\n"
            f"trace: {trace}\nmode={mode}\n"
            f"table-only: { {k: got[k] for k in set(got) - set(want)} }\n"
            f"model-only: { {k: want[k] for k in set(want) - set(got)} }\n"
            f"diff: { {k: (got[k], want[k]) for k in set(got) & set(want) if got[k] != want[k]} }"
        )
    # whatever layout the random walk produced (CoW/MoR deltas, DVs,
    # mixed moduli, post-expire) must also pass the integrity audit —
    # fsck's invariants are exactly what the walk's reads relied on
    rep = t.fsck()
    assert rep["ok"], f"fsck violations after trace {trace}: {rep['errors']}"


@pytest.mark.parametrize("seed", [11, 23, 37, 59])
def test_random_op_sequences_match_reference_model(spark, tmp_path, seed):
    _run_sequence(spark, tmp_path, seed)
