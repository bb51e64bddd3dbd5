"""Distributed BPE tokenizer induction (Sennrich et al. 2016, public) —
training a subword vocabulary from the corpus itself, the step every
LLM data pipeline runs before token counting/packing can be exact.

Scale design — the classic algorithm is corpus-sequential; here it is
restructured so CORPUS-scale work happens exactly once:

  1. ONE pass over the corpus reduces it to the word vocabulary
     (word, count) — a partial-agg groupBy; everything after operates
     on the vocabulary (|V| ~ 10^6-10^8 at 100 TB), never the corpus.
  2. Each merge iteration: adjacent symbol pairs explode from the
     symbol arrays WEIGHTED by word count (one partial-agg groupBy of
     vocabulary-sized input), the argmax pair comes back as ONE driver
     row (count desc, pair lexicographic — deterministic ties), and a
     mapInPandas applies the merge to the symbol arrays. The merge
     list is inherently sequential (merge i+1 depends on i), exactly
     as in the reference algorithm — the parallelism is within each
     iteration, which is where the data is.
  3. Lineage is cut with localCheckpoint every few iterations (the
     connected-components discipline) so 100+ merges don't stack 100
     plan layers.

End-of-word marker: '</w>' appended to each word's last character,
the original BPE convention, so merges never cross word boundaries
and the encoder can restore spacing."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maestro_spark.operators.textstats import simple_token_col

EOW = "</w>"


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, n) vocabulary: the ONLY corpus-scale pass."""
    words = docs.select(
        F.explode(simple_token_col(F.col(text_col))).alias("word"))
    return words.groupBy("word").agg(F.count("*").alias("n"))


def _init_symbols(vocab: DataFrame) -> DataFrame:
    """word → initial symbol array: characters, last one + EOW."""
    chars = F.split(F.col("word"), "")
    syms = F.filter(chars, lambda c: F.length(c) > 0)
    last = F.size(syms) - 1
    syms = F.transform(
        syms, lambda c, i: F.when(i == last, F.concat(c, F.lit(EOW)))
        .otherwise(c))
    return vocab.select("word", "n", syms.alias("syms"))


def _merge_syms(syms: list, left: str, right: str) -> list:
    """Greedy left-to-right single-pair merge (reference semantics:
    the freshly-merged symbol may pair with the NEXT symbol in the
    same pass, never re-pair backwards)."""
    res = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            res.append(left + right)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def bpe_train(docs: DataFrame, n_merges: int = 50,
              text_col: str = "text",
              checkpoint_every: int = 8) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus. Returns the ordered
    merge list [(left, right), ...] — the training artifact a tokenizer
    ships. Deterministic: ties on pair count break lexicographically.
    Stops early when no pair remains (fully merged vocabulary)."""
    vocab = _init_symbols(_word_vocab(docs, text_col)).persist()
    vocab.count()  # materialize the one corpus pass
    merges: list[tuple[str, str]] = []
    tail = F.greatest(F.size("syms") - 1, F.lit(0))
    for it in range(n_merges):
        pairs = vocab.select(
            "n",
            F.explode(F.zip_with(
                F.slice("syms", 1, tail), F.slice("syms", 2, tail),
                lambda a, b: F.struct(a.alias("l"), b.alias("r"))))
            .alias("p"))
        top = (pairs.groupBy("p.l", "p.r")
               .agg(F.sum("n").alias("cnt"))
               .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
               .limit(1).collect())
        if not top:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        nxt = _apply_merge(vocab, left, right)
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()
        else:
            nxt = nxt.persist()
            nxt.count()
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one merge to every symbol array — vocabulary-sized
    mapInPandas (per-row Python over |V| short lists, never corpus)."""
    fields = vocab.schema.fieldNames()

    def merge_batch(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [_merge_syms(list(s), left, right)
                           for s in pdf["syms"]]
            yield pdf[fields]

    return vocab.mapInPandas(merge_batch, schema=vocab.schema)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE encode of one word under a learned merge ranking:
    repeatedly apply the LOWEST-RANK applicable merge (training order),
    exactly reproducing the symbols training would assign."""
    syms = list(word)
    if not syms:
        return []
    syms[-1] = syms[-1] + EOW
    while len(syms) > 1:
        best_pair, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_pair, best_rank = (syms[i], syms[i + 1]), r
        if best_pair is None:
            break
        syms = _merge_syms(syms, *best_pair)
    return syms


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc subword token counts under a learned merge list — the
    exact-token-budget companion to curation.token_budget_cap /
    pack_sequences. Arrow-batched pandas UDF over the doc text; the
    merge ranking broadcasts via closure (a merge list is KBs) and a
    per-batch word memo amortizes encoding across repeated words."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("int")
    def n_bpe(texts: pd.Series) -> pd.Series:
        import re
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            total = 0
            for w in re.findall(r"[a-z0-9]+", (t or "").lower()):
                c = memo.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    memo[w] = c
                total += c
            out.append(total)
        return pd.Series(out, dtype="int32")

    return docs.select(id_col, n_bpe(F.col(text_col)).alias("n_bpe_tokens"))
