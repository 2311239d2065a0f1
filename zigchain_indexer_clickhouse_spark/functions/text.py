"""Text-analysis column helpers shared by the training-data operators.

All pure builtin expressions; the stopword lists are tiny literal
arrays that broadcast inside the plan (no join needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "des", "une", "est"),
    "zh": ("的", "是", "了", "在", "和"),
}

# BPE-ish pre-tokenizer: word runs or single non-space punctuation.
BPE_REGEX = r"\w+|[^\w\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(F.trim(text), r"\s+")


def stopword_hits(toks: Column, lang: str) -> Column:
    """Count of tokens (with multiplicity) present in ``lang``'s list."""
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def stopword_hits_sql(toks_expr: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, x -> x IN ({lst})))"
