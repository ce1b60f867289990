"""Deterministic synthetic-corpus generators for benchmarks and tests.

The shipped testdata's ``documents.text`` is template-generated, so its
distinct-word vocabulary tops out around a few hundred types -- enough
to gate BPE correctness, too small to exercise tokenizer training at a
real vocabulary (VERDICT r8 #7 asks for >= 16k distinct words and
>= 4096 merges). ``natural_vocab_corpus`` fills that gap: a
morphology-shaped vocabulary (prefix + 1..3 CV(C) syllables + suffix,
the structure BPE merges exploit on natural text) with Zipf-distributed
token frequencies, assembled into fixed-length documents.

Everything is a pure function of ``seed`` (``random.Random(seed)`` --
Python's generator is specified and stable across platforms), so two
engines / two runs see byte-identical corpora; no wall-clock or OS
randomness is consulted. Generation happens driver-side then
parallelizes -- fine for benchmark corpora (hundreds of thousands of
tokens); a 100 TB corpus would come from real data, not this.
"""

from __future__ import annotations

import random
from bisect import bisect_left
from itertools import accumulate

from pyspark.sql import DataFrame, SparkSession

__all__ = ["natural_vocab_corpus", "natural_vocab_docs", "natural_vocab_words"]

_ONSETS = list("bcdfghjklmnprstvwz") + ["ch", "sh", "th", "st", "br", "tr"]
_VOWELS = ["a", "e", "i", "o", "u", "ai", "ea", "ou"]
_CODAS = ["", "", "", "n", "r", "s", "t", "l", "nd", "ck"]
_PREFIXES = ["", "", "", "", "un", "re", "pre", "de", "over", "sub", "inter"]
_SUFFIXES = ["", "", "", "", "ing", "ed", "tion", "ly", "er", "ness", "s", "al"]


def natural_vocab_words(n_words: int, seed: int = 0) -> list[str]:
    """``n_words`` distinct morphology-shaped words, deterministic in
    ``seed``. Rank order is generation order (rank 0 = most frequent
    under the Zipf assembly below)."""
    rng = random.Random(seed)
    seen: set[str] = set()
    words: list[str] = []
    while len(words) < n_words:
        n_syl = rng.choice((1, 2, 2, 3))
        core = "".join(
            rng.choice(_ONSETS) + rng.choice(_VOWELS) + rng.choice(_CODAS)
            for _ in range(n_syl)
        )
        w = rng.choice(_PREFIXES) + core + rng.choice(_SUFFIXES)
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def natural_vocab_docs(
    n_words: int = 16384,
    n_tokens: int = 400_000,
    doc_len: int = 256,
    seed: int = 0,
) -> list[tuple[int, str, str]]:
    """The pure-Python (doc_id, source, text) rows behind
    ``natural_vocab_corpus`` -- split out so an engine-independent
    consumer (the DuckDB oracle of ``q_bpe_natural_vocab``, which
    inlines the corpus as a VALUES relation) sees byte-for-byte the
    rows the Spark frame is built from."""
    words = natural_vocab_words(n_words, seed)
    cum = list(accumulate(1.0 / (r + 1) for r in range(n_words)))
    total = cum[-1]
    rng = random.Random(seed + 1)
    docs: list[tuple[int, str, str]] = []
    tok: list[str] = []
    for i in range(n_tokens):
        tok.append(words[bisect_left(cum, rng.random() * total)])
        if len(tok) == doc_len or i == n_tokens - 1:
            docs.append((len(docs), f"src{len(docs) % 4}", " ".join(tok)))
            tok = []
    return docs


def natural_vocab_corpus(
    spark: SparkSession,
    n_words: int = 16384,
    n_tokens: int = 400_000,
    doc_len: int = 256,
    seed: int = 0,
    n_partitions: int = 32,
) -> DataFrame:
    """A (doc_id, source, text) corpus of ``n_tokens`` Zipf-sampled
    tokens over a ``n_words``-type vocabulary, chunked into documents
    of ``doc_len`` tokens. Word rank r is drawn with probability
    proportional to 1/(r+1) (inverse-CDF over the exact harmonic
    cumulative, so the draw is exact, not approximate)."""
    docs = natural_vocab_docs(n_words, n_tokens, doc_len, seed)
    return spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    ).repartition(n_partitions)
