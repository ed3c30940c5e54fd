"""Distributed BPE (byte-pair-encoding) merge training.

The scalable decomposition every real tokenizer trainer uses: BPE
statistics depend only on the WORD-FREQUENCY table, not the raw corpus —
one corpus pass builds (word, freq), and all iterations run over that
small table (|vocab| rows, not |corpus|). Each merge iteration:

  1. adjacent symbol pairs per word, freq-weighted  (JVM zip_with+explode)
  2. global pair counts -> argmax, deterministic tie-break
     (count desc, pair asc)                         (tiny driver take(1))
  3. rewrite ONLY the words containing the winning pair (JVM `exists`
     filter; the sequential merge rewrite runs as a pandas kernel on that
     small affected subset), union back, localCheckpoint to keep the
     iteration lineage flat — same pattern as graph.connected_components.

K merges = K small jobs over the word table; the corpus is never
re-scanned. At 100 TB the corpus pass dominates (one shuffle on word) and
the iterations are metadata-sized.

`apply_bpe` then tokenizes text with the learned merge ranks (greedy
lowest-rank-first, the standard BPE encode) as a batched pandas kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _adjacent_pairs(syms_col):
    """array<string> -> array<struct<a,b>> of adjacent symbol pairs."""
    n = F.size(syms_col)
    return F.zip_with(
        F.slice(syms_col, 1, n - 1),
        F.slice(syms_col, 2, n - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-wide pass: (word, freq)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges; returns [(rank, a, b, count), ...].
    Deterministic: pair ties break lexicographically."""
    n_part = max(2, docs.sparkSession.sparkContext.defaultParallelism // 4)
    cur = word_freqs(docs, text_col).withColumn(
        "syms",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))),
    ).select("word", "freq", "syms").coalesce(n_part).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            cur.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .take(1)
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, cnt))

        has_pair = F.exists(
            _adjacent_pairs(F.col("syms")),
            lambda s: (s["a"] == a) & (s["b"] == b),
        )
        affected = cur.filter(has_pair)
        untouched = cur.filter(~has_pair)

        def rewrite(batches, _a=a, _b=b):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    L = list(syms)
                    res = []
                    j = 0
                    while j < len(L):
                        if j + 1 < len(L) and L[j] == _a and L[j + 1] == _b:
                            res.append(_a + _b)
                            j += 2
                        else:
                            res.append(L[j])
                            j += 1
                    out.append(res)
                pdf = pdf.copy()
                pdf["syms"] = out
                yield pdf

        # coalesce: union ADDS partition counts — without this the table
        # doubles its partitions every merge (exponential task explosion)
        cur = (
            untouched.unionByName(
                affected.mapInPandas(rewrite, schema=cur.schema)
            )
            .coalesce(n_part)
            .localCheckpoint()
        )
    return merges


def merges_df(spark, merges) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank int, pair_a string, pair_b string, cnt long"
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize text with learned merges: per word, repeatedly merge the
    LOWEST-RANK adjacent pair present (standard greedy BPE encode).
    Batched pandas kernel; the rank table broadcasts."""
    ranks = {(a, b): r for r, a, b, _ in merges}
    b_ranks = docs.sparkSession.sparkContext.broadcast(ranks)

    def encode(batches):
        R = b_ranks.value

        def enc_word(word):
            L = list(word) + [END]
            while len(L) > 1:
                best, best_i = None, -1
                for i in range(len(L) - 1):
                    r = R.get((L[i], L[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, best_i = r, i
                if best is None:
                    break
                L[best_i : best_i + 2] = [L[best_i] + L[best_i + 1]]
            return L

        for pdf in batches:
            toks = [
                [t for w in text.split(" ") if w for t in enc_word(w)]
                for text in pdf[text_col]
            ]
            out = pdf[[id_col]].copy()
            out["bpe_tokens"] = toks
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        encode, schema=f"{id_col} long, bpe_tokens array<string>"
    )
