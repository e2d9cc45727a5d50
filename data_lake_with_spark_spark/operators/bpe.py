"""Byte-pair-encoding tokenizer — learned merges, not the regex
approximation (``functions/text.py:BPE_ISH_PATTERN`` stays as the
zero-training fallback).

Scale shape (the standard one, same as GPT-2's reference trainer):
the DISTRIBUTED step is the word-frequency count — one groupBy over
the corpus, the only part that scales with data volume. The merge
loop then runs driver-side over the word-count table (|distinct
words|, not |corpus|; the same driver-side-small-model pattern as the
PQ codebooks and PCA eigendecomposition). Application is an
Arrow-batched pandas UDF with a per-worker word cache — each distinct
word is segmented once per executor, not once per occurrence.

Determinism: merge selection ties break lexicographically, so the
learned merge list is a pure function of the corpus — tests pin it
against a pure-Python reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for word, c in vocab.items():
        for a, b in zip(word, word[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + c
    return counts


def _merge_word(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and (word[i], word[i + 1]) == pair:
            out.append(word[i] + word[i + 1])
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def learn_bpe_merges(
    docs: DataFrame, n_merges: int = 50, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Train a merge list. Distributed: ONE word-frequency groupBy.
    Driver-side: the greedy merge loop over the (small) count table —
    highest pair count wins, ties break lexicographically."""
    rows = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(r["w"]) + [END]): r["count"] for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic: max count, then lexicographically SMALLEST pair
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        vocab = {_merge_word(w, best): c for w, c in vocab.items()}
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    best-ranked (earliest-learned) adjacent pair — the canonical BPE
    inference loop."""
    pieces = tuple(list(word) + [END])
    while len(pieces) > 1:
        ranked = [
            (ranks[p], i)
            for i, p in enumerate(zip(pieces, pieces[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        pieces = pieces[:i] + (pieces[i] + pieces[i + 1],) + pieces[i + 2 :]
    return list(pieces)


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with the learned merges: appends
    ``out_col`` (array<string>) and ``n_bpe_tokens``. Arrow-batched;
    a per-worker cache segments each distinct word once per executor."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def tokenize(texts):  # type: ignore[no-untyped-def]
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def tok(text: str | None) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = segment_word(w, ranks)
                out.extend(got)
            return out

        return pd.Series([tok(t) for t in texts])

    return docs.withColumn(out_col, tokenize(F.col(text_col))).withColumn(
        "n_bpe_tokens", F.size(out_col)
    )
