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


# character-trigram prior per language, built from the doc corpus itself in
# fit_lang_id (a real system ships trained priors; the mechanism is the same)
def fit_lang_id(df: DataFrame, text_col: str = "text", lang_col: str = "lang"):
    """Learn top character trigrams per language from a labeled sample.
    Returns {lang: set(trigrams)} suitable for broadcasting."""
    sample = df.select(lang_col, text_col).sample(0.3, seed=42).toPandas()
    model: dict[str, set] = {}
    for lang, grp in sample.groupby(lang_col):
        text = " ".join(grp[text_col].tolist())[:200_000]
        grams = pd.Series(
            [text[i : i + 3] for i in range(0, max(len(text) - 2, 0), 1)]
        )
        model[lang] = set(grams.value_counts().head(300).index)
    return model


def lang_id(df: DataFrame, model: dict[str, set], text_col: str = "text") -> DataFrame:
    """N-gram-overlap language ID: argmax over per-language trigram hit
    counts. Vectorized pandas UDF (Arrow batches); model broadcast once."""
    spark = df.sparkSession
    b_model = spark.sparkContext.broadcast(model)

    @pandas_udf(T.StringType())
    def predict(texts: pd.Series) -> pd.Series:
        m = b_model.value
        langs = list(m)

        def score_one(t: str) -> str:
            grams = {t[i : i + 3] for i in range(0, max(len(t) - 2, 0), 7)}
            hits = np.array([len(grams & m[lg]) for lg in langs])
            return langs[int(hits.argmax())] if hits.max() > 0 else "und"

        return texts.map(score_one)

    return df.withColumn("lang_pred", predict(F.col(text_col)))


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprints: full-content md5 (exact-dup key) plus a
    normalized rolling fingerprint — lowercase, collapse whitespace, then
    xxhash64 — robust to trivial formatting diffs. Both JVM-side."""
    norm = F.lower(F.regexp_replace(F.col(col), r"\s+", " "))
    return df.withColumn("fp_md5", F.md5(F.col(col))).withColumn(
        "fp_norm", F.xxhash64(norm)
    )
