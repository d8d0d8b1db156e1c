"""Byte-pair-encoding tokenization (Sennrich et al. 2016).

An LLM data pipeline eventually needs REAL subword tokenization — for
sequence packing budgets, fertility audits, and per-token cost estimates
— not just the whitespace/regex approximations in `operators/text.py`.
This module implements classic BPE end to end with the right distributed
split:

- **Training is a word-histogram problem.** The Sennrich merge loop runs
  over the word-frequency DICT (vocab-sized), not the corpus. So the only
  distributed step is ONE word-count aggregation; the merge learning then
  runs driver-side on a relation that is metadata-sized even at 100 TB
  (capped by ``top_words``, standard practice — tail words contribute
  nothing to pair statistics). This mirrors how production tokenizers are
  actually trained: histogram on the cluster, merges on one machine.
- **Encoding is embarrassingly parallel.** The learned merge list
  broadcasts to every worker; tokenization applies merges per word with a
  per-word cache inside an Arrow-batched ``mapInPandas`` (iterative merge
  application is genuinely not expressible as built-in column ops — this
  is the sanctioned vectorized escape hatch, same tier as multimodal
  decode).

Determinism: merge selection breaks count ties by ascending pair order,
so training is reproducible regardless of hash/dict iteration order.
Words carry an end-of-word marker ``</w>`` (the paper's formulation), so
``low`` the word and ``low`` the prefix of ``lower`` learn distinct units.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbms_data_anonymity_differential_privacy_spark.operators.text import WS
from dbms_data_anonymity_differential_privacy_spark.operators.util import fan_out

EOW = "</w>"


def word_histogram(
    df: DataFrame, text_col: str = "text", top_words: int = 50_000
) -> list[tuple[str, int]]:
    """The one distributed step of BPE training: corpus word counts,
    truncated to the ``top_words`` most frequent (ties broken by word so
    the cutoff is deterministic). Word-count shuffle shape — map-side
    partial aggregation, the exchange carries near-distinct words."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS)
    counts = (
        fan_out(df)
        .select(F.explode_outer(toks).alias("w"))
        .where(F.col("w").isNotNull() & (F.col("w") != ""))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(int(top_words))
    )
    return [(r["w"], int(r["c"])) for r in counts.collect()]


def learn_merges(
    histogram: Sequence[tuple[str, int]], n_merges: int = 200, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Classic Sennrich merge learning over a word histogram (driver-side;
    the histogram is vocab-sized). Returns the ordered merge list.
    Tie-break: highest count, then lexicographically smallest pair."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, count in histogram:
        vocab[tuple(word) + (EOW,)] = vocab.get(tuple(word) + (EOW,), 0) + count
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, count in vocab.items():
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pairs[p] = pairs.get(p, 0) + count
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, count in vocab.items():
            out, i = [], 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + count
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    top_words: int = 50_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Train BPE on a corpus: distributed histogram + driver-side merges."""
    return learn_merges(
        word_histogram(df, text_col, top_words), n_merges, min_pair_count
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (lowest-rank merge first — the
    order they were learned, the standard BPE encoder rule)."""
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_tokenize(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a learned merge list → ``(id_col,
    n_words, n_bpe_tokens, tokens: array<string>)``.

    The merge list rides the closure (broadcast with the task binary —
    kilobytes for any practical vocab); encoding runs in Arrow-batched
    ``mapInPandas`` with a per-word memo, so each distinct word in a
    batch is encoded once however often it repeats."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    schema = (
        f"{id_col} long, n_words int, n_bpe_tokens int, tokens array<string>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = encode_word(word, ranks)
            return got

        for pdf in batches:
            ids, n_words, n_toks, toks = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").lower().strip().split() if w]
                out: list[str] = []
                for w in words:
                    out.extend(enc(w))
                ids.append(did)
                n_words.append(len(words))
                n_toks.append(len(out))
                toks.append(out)
            yield pd.DataFrame(
                {id_col: ids, "n_words": n_words, "n_bpe_tokens": n_toks, "tokens": toks}
            )

    return fan_out(df.select(id_col, text_col)).mapInPandas(run, schema)
