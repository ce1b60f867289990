"""Text-analysis operators for training-data curation: token counting,
quality features, language-ID (marker-token heuristic), and document
fingerprinting. All pure Catalyst expressions over the token array --
no Python in the hot path, so the work stays inside whole-stage codegen
and scales linearly with corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# Deterministic marker lexicons (toy profiles over the synthetic corpus
# vocabulary; swap for real stopword tables in production). Order of the
# dict is the tie-break order (alphabetical).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("key", "value", "hash"),
    "en": ("the", "a", "of"),
    "es": ("data", "table", "row"),
    "fr": ("line", "column", "part"),
    "zh": ("spark", "query", "scan"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features: token count, stopword ratio, mean
    token length. Ratios are single int/int divisions (deterministic).
    """
    toks = tokens(text_col)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        n_stop.alias("n_stop"),
        (n_stop / n).alias("stop_ratio"),
        (sum_len / n).alias("avg_token_len"),
    )


def lang_scores(text_col: Column | str) -> dict[str, Column]:
    """Marker-hit counts per language."""
    toks = tokens(text_col)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Argmax language by marker count; ties break to the alphabetically
    first language (fixed CASE order -- same shape as the oracle SQL).
    """
    scores = lang_scores(text_col)
    langs = sorted(scores)
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    best = None
    for lang in langs:
        best = scores[lang] if best is None else F.greatest(best, scores[lang])
    return df.select(
        F.col(id_col).alias("id"),
        pred.alias("pred_lang"),
        best.alias("score"),
    )
