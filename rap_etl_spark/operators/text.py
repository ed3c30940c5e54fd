"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All operate on the ``documents`` table (doc_id, text, lang, source,
n_chars). JVM-side expressions wherever possible; the language-ID heuristic
is a vectorized pandas UDF (per-batch numpy/pandas ops, no per-row Python
in the hot loop beyond the vectorized string kernel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# BPE-ish tokenizer regex: word pieces, numbers, punctuation runs —
# deliberately close to the GPT-2 pre-tokenizer's shape, expressible
# JVM-side via regexp_extract_all (no Python in the hot path)
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (both JVM-side)."""
    # pattern passed as a Column literal, NOT interpolated into a SQL string
    # (SQL string literals eat backslashes: '\s' would become 's')
    return df.withColumn(
        "n_ws_tokens", F.size(F.split(F.col(col), r"\s+"))
    ).withColumn(
        "n_bpe_tokens",
        F.size(F.regexp_extract_all(F.col(col), F.lit(BPE_ISH), F.lit(0))),
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Length/word-shape quality heuristics (Gopher-rule-flavored):
    word count band, mean word length band, alpha ratio, repetition ratio
    (distinct words / words). Pure SQL expressions — runs in codegen."""
    words = F.split(F.col(col), r"\s+")
    n_words = F.size(words)
    mean_wl = (F.length(F.col(col)) - (n_words - 1)) / n_words
    distinct_ratio = F.size(F.array_distinct(words)) / n_words
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(col), r"[^A-Za-z]", ""))
        / F.length(F.col(col))
    )
    score = (
        F.when((n_words >= 5) & (n_words <= 100000), F.lit(1)).otherwise(0)
        + F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1)).otherwise(0)
        + F.when(distinct_ratio >= 0.2, F.lit(1)).otherwise(0)
        + F.when(alpha_ratio >= 0.5, F.lit(1)).otherwise(0)
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_wl, 4))
        .withColumn("distinct_ratio", F.round(distinct_ratio, 4))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 4))
        .withColumn("quality_score", score)
    )


# byte-trigram prior per language, built from the doc corpus itself in
# fit_lang_id (a real system ships trained priors; the mechanism is the same)
def _trigram_codes(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """All byte-trigrams of `data` as uint32 codes (b0<<16|b1<<8|b2), fully
    vectorized. Returns (codes, valid) where valid=False marks trigrams
    that touch a 0x00 byte — the document separator, which UTF-8 never
    produces for real characters — so concatenated docs never leak
    cross-document trigrams."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size < 3:
        return np.empty(0, np.uint32), np.empty(0, bool)
    codes = (
        (b[:-2].astype(np.uint32) << 16)
        | (b[1:-1].astype(np.uint32) << 8)
        | b[2:].astype(np.uint32)
    )
    valid = (b[:-2] != 0) & (b[1:-1] != 0) & (b[2:] != 0)
    return codes, valid


def fit_lang_id(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    sample_frac: float = 0.3,
    max_rows: int = 20_000,
):
    """Learn the top-300 byte-trigram codes per language from a labeled
    sample. Returns {lang: sorted uint32 ndarray} suitable for broadcasting.

    The driver collect is HARD-CAPPED at `max_rows` regardless of table
    size (the trigram prior needs a few hundred KB of text per language;
    an uncapped fraction would scale the collect with the corpus). Trigram
    extraction and counting are single numpy passes — no per-gram Python."""
    sample = (
        df.select(lang_col, text_col)
        .filter(F.col(text_col).isNotNull())
        .sample(sample_frac, seed=42)
        .limit(max_rows)
        .toPandas()
    )
    model: dict[str, np.ndarray] = {}
    for lang, grp in sample.groupby(lang_col):
        text = "\x00".join(grp[text_col].tolist())[:200_000]
        codes, valid = _trigram_codes(text.encode("utf-8"))
        codes = codes[valid]
        if codes.size == 0:
            model[lang] = np.empty(0, np.uint32)
            continue
        uniq, counts = np.unique(codes, return_counts=True)
        top = uniq[np.argsort(-counts, kind="stable")[:300]]
        model[lang] = np.sort(top)
    return model


def lang_id(df: DataFrame, model: dict[str, np.ndarray], text_col: str = "text") -> DataFrame:
    """Trigram-hit language ID: argmax over per-language trigram-hit counts,
    CountVectorizer-style and fully vectorized — per Arrow batch, ALL texts
    are concatenated once, trigram codes come from three shifted numpy
    slices, per-language hits are one np.isin each, and per-row counts fall
    out of one bincount per language. No per-row Python anywhere."""
    spark = df.sparkSession
    b_model = spark.sparkContext.broadcast(model)

    @pandas_udf(T.StringType())
    def predict(texts: pd.Series) -> pd.Series:
        m = b_model.value
        langs = list(m)
        t = texts.fillna("")
        enc = t.str.encode("utf-8")
        lens = enc.str.len().to_numpy(dtype=np.int64)
        n = len(t)
        if n == 0 or not langs:
            return pd.Series(["und"] * n)
        cat = b"\x00".join(enc.tolist())
        codes, valid = _trigram_codes(cat)
        # byte offset where each row starts inside `cat` (rows separated by
        # one 0x00): searchsorted maps a trigram position back to its row
        starts = np.zeros(n, dtype=np.int64)
        if n > 1:
            np.cumsum(lens[:-1] + 1, out=starts[1:])
        pos = np.arange(codes.size, dtype=np.int64)
        rows = np.searchsorted(starts, pos, side="right") - 1
        scores = np.zeros((len(langs), n), dtype=np.int64)
        for i, lg in enumerate(langs):
            hit = valid & np.isin(codes, m[lg])
            if hit.any():
                scores[i] = np.bincount(rows[hit], minlength=n)
        best = scores.argmax(axis=0)
        out = np.where(
            scores.max(axis=0) > 0,
            np.asarray(langs, dtype=object)[best],
            "und",
        )
        return pd.Series(out)

    return df.withColumn("lang_pred", predict(F.col(text_col)))


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprints: full-content md5 (exact-dup key) plus a
    normalized rolling fingerprint — lowercase, collapse whitespace, then
    xxhash64 — robust to trivial formatting diffs. Both JVM-side."""
    norm = F.lower(F.regexp_replace(F.col(col), r"\s+", " "))
    return df.withColumn("fp_md5", F.md5(F.col(col))).withColumn(
        "fp_norm", F.xxhash64(norm)
    )


def unigram_lm_scores(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Unigram language-model quality score (the CCNet-style perplexity
    filter, reduced to its distributive core): fit a unigram LM on the
    corpus itself — top `vocab_size` words by frequency, logprob =
    ln(cnt/total) — and score each document by the mean logprob of its
    words, out-of-vocabulary words floored at ln(0.5/total). Higher =
    closer to the corpus distribution; gibberish and boilerplate-heavy
    docs land in the tails.

    Entirely JVM DataFrame ops, no fitted driver state: one explode +
    count for the LM (the vocab frame is tiny and broadcasts into the
    scoring join), one explode + broadcast join + avg for the scores.
    Deterministic at any scale: vocabulary ties break lexicographically.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(col), " ")).alias("w")
    )
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    vocab = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.col("cnt").desc(), F.col("w"))
        .limit(vocab_size)
        .select("w", (F.log(F.col("cnt") / F.col("total"))).alias("logprob"))
    )
    floor = total.select(F.log(F.lit(0.5) / F.col("total")).alias("floor"))
    return (
        words.join(F.broadcast(vocab), "w", "left_outer")
        .crossJoin(F.broadcast(floor))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(
                F.avg(F.coalesce(F.col("logprob"), F.col("floor"))), 6
            ).alias("mean_logprob"),
            F.sum(
                F.when(F.col("logprob").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )


def unigram_drift(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group unigram-distribution drift vs the whole corpus — the
    data-mix monitor that catches one source's token distribution shifting
    between snapshots (vocabulary churn, language drift, template spam).

    Reports the total-variation distance as an EXACT integer numerator so
    the result is bit-stable across engines (no float summation order):

        drift_num(g) = sum_w | c_g(w)*N - c(w)*N_g |   over w present in g
                     + N_g * (N - sum_{w in g} c(w))    (the absent words)

    and TV(g, corpus) = drift_num / (2 * N_g * N). The absent-word term
    needs NO join against the full vocabulary: sum over words missing from
    g of c(w) equals N minus the sum of corpus counts of g's own words.

    Plan: one explode -> one (group, word) aggregate; corpus word totals
    re-aggregated from those pre-combined pairs (never a second pass over
    raw tokens); group/corpus totals broadcast. Nothing after the first
    aggregate scales with token volume."""
    words = df.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    pair = words.groupBy("g", "word").agg(F.count(F.lit(1)).alias("c_g"))
    wtot = pair.groupBy("word").agg(F.sum("c_g").alias("c_all"))
    gtot = pair.groupBy("g").agg(F.sum("c_g").alias("n_g"))
    ntot = gtot.agg(F.sum("n_g").alias("n_all"))
    per_word = (
        pair.join(wtot, on="word")
        .join(F.broadcast(gtot), on="g")
        .crossJoin(F.broadcast(ntot))
    )
    return per_word.groupBy("g").agg(
        F.first("n_g").alias("n_group"),
        F.first("n_all").alias("n_all"),
        (
            F.sum(
                F.abs(F.col("c_g") * F.col("n_all") - F.col("c_all") * F.col("n_g"))
            )
            + F.first("n_g") * (F.first("n_all") - F.sum("c_all"))
        ).alias("drift_num"),
    ).withColumnRenamed("g", group_col)
