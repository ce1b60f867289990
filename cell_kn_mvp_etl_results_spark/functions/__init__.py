from .money import avg_money, cents, money, qty_long
from .text import (
    char_ngrams,
    curie_normalize,
    hyphenate,
    parse_list_literal,
    remove_protocols,
    stable_uuid,
    strip_purl,
    tokens,
    word_shingles,
)

__all__ = [
    "avg_money",
    "cents",
    "char_ngrams",
    "curie_normalize",
    "hyphenate",
    "money",
    "parse_list_literal",
    "qty_long",
    "remove_protocols",
    "stable_uuid",
    "strip_purl",
    "tokens",
    "word_shingles",
]
