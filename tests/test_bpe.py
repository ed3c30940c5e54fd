"""Distributed BPE trainer (operators/bpe.py) vs a pure-Python reference
implementation on the same corpus — merge-for-merge equality, plus encode
round-trip invariants."""

from collections import Counter

from rap_etl_spark.operators.bpe import END, apply_bpe, train_bpe


def _reference_bpe(wf: Counter, n_merges: int, min_count: int = 2):
    """Textbook single-process BPE on a word-frequency dict, with the same
    deterministic tie-break (count desc, pair asc) and left-greedy
    rewrite."""
    words = {w: list(w) + [END] for w in wf}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, f in wf.items():
            syms = words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((rank, a, b, cnt))
        for w, L in words.items():
            res, j = [], 0
            while j < len(L):
                if j + 1 < len(L) and L[j] == a and L[j + 1] == b:
                    res.append(a + b)
                    j += 2
                else:
                    res.append(L[j])
                    j += 1
            words[w] = res
    return merges


def test_bpe_matches_reference(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(80)
    texts = [r["text"] for r in docs.select("text").collect()]
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    ref = _reference_bpe(wf, n_merges=12)
    got = train_bpe(docs, n_merges=12)
    assert got == ref
    assert len(got) == 12  # corpus is big enough to yield all 12


def test_bpe_encode_roundtrip(spark, sf_small):
    """Greedy encode must preserve content: per doc, concatenating the BPE
    tokens reproduces the words (each word ends with the END marker)."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(30)
    merges = train_bpe(docs, n_merges=15)
    enc = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(docs, merges).collect()}
    for r in docs.select("doc_id", "text").collect():
        joined = "".join(enc[r["doc_id"]])
        expect = "".join(w + END for w in r["text"].split(" ") if w)
        assert joined == expect
    # merges actually compress: fewer tokens than characters
    n_tok = sum(len(v) for v in enc.values())
    n_chr = sum(len(r["text"]) for r in docs.select("text").collect())
    assert n_tok < n_chr
