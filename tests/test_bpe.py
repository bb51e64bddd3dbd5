"""Distributed BPE trainer vs a pure-Python reference implementation
(Sennrich et al. 2016 algorithm) on the same corpus."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.bpe import (EOW, bpe_token_counts, bpe_train,
                                         encode_word)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _ref_bpe(texts: list[str], n_merges: int):
    """Reference trainer: word vocab -> iterative argmax pair merge,
    ties (count desc, pair lexicographic)."""
    vocab = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            vocab[w] += 1
    syms = {w: list(w[:-1]) + [w[-1] + EOW] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, n in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        left, right = best
        for w in vocab:
            s = syms[w]
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = res
    return merges, syms, vocab


def test_bpe_train_matches_reference(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    want, ref_syms, vocab = _ref_bpe(texts, 25)
    got = bpe_train(docs, n_merges=25, checkpoint_every=5)
    assert got == want

    # encoder reproduces training segmentation for every vocab word
    ranks = {p: i for i, p in enumerate(got)}
    for w in list(vocab)[:200]:
        assert encode_word(w, ranks) == ref_syms[w]

    # round-trip: concatenation restores the word + EOW marker
    for w in list(vocab)[:50]:
        assert "".join(encode_word(w, ranks)) == w + EOW


def test_bpe_token_counts(spark, docs):
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    merges, _, _ = _ref_bpe(list(texts.values()), 15)
    got = bpe_token_counts(docs, merges).toPandas() \
        .set_index("doc_id")["n_bpe_tokens"]
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, t in list(texts.items())[:80]:
        want = sum(len(encode_word(w, ranks))
                   for w in re.findall(r"[a-z0-9]+", t.lower()))
        assert got[doc_id] == want
    # merging strictly reduces token counts vs characters
    lens = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")))
    ).collect()[0][0]
    assert got.sum() < lens


def test_bpe_early_stop(spark):
    # single repeated 2-char word: merges exhaust quickly, no crash
    pdf = spark.createDataFrame([(i, "ab ab ab") for i in range(5)],
                                "doc_id long, text string")
    merges = bpe_train(pdf, n_merges=10)
    assert len(merges) <= 2  # ('a','b</w>') then nothing mergeable
