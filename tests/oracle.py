"""Naive single-process reference implementation (FIXTURES.md §B4).

The 'diff-then-assert' oracle: sort events by (doc_id, lsn, ingest_ts, op),
drop duplicate (doc_id, lsn) deliveries, keep the last event per key; a
final 'D' removes the key. Deliberately simple pandas — this is what the
distributed engine must converge to."""

from __future__ import annotations

import numpy as np
import pandas as pd


def naive_final_state(events: pd.DataFrame) -> pd.DataFrame:
    df = events.sort_values(["doc_id", "lsn", "ingest_ts", "op"], kind="mergesort")
    df = df.drop_duplicates(["doc_id", "lsn"], keep="last")
    last = df.groupby("doc_id", sort=True).tail(1)
    final = last[last["op"] != "D"].copy()
    cols = [c for c in ["doc_id", "tokens", "n_tok", "source", "lang"] if c in final.columns]
    return final[cols].reset_index(drop=True)


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for comparison: sorted by doc_id, tokens as tuples."""
    out = pdf.copy()
    if "tokens" in out.columns:
        out["tokens"] = out["tokens"].map(
            lambda a: tuple(int(x) for x in a) if a is not None and not (
                isinstance(a, float) and np.isnan(a)
            ) else None
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    g, w = canonical(got), canonical(want)
    assert list(g.columns) == list(w.columns), (list(g.columns), list(w.columns))
    assert len(g) == len(w), f"row counts differ: got {len(g)} want {len(w)}"
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        mism = [
            (i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if a != b and not (
                a is None and b is None
            )
        ]
        assert not mism, f"column {col}: {len(mism)} mismatches, first: {mism[:3]}"
