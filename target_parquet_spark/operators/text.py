"""Text-analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All pure Column expressions (no UDFs): at 100 TB these run inside
whole-stage codegen and scale linearly with no shuffle — each document is
scored independently.  The token/shingle definitions are deliberately
portable (regex split + md5) so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bigrams",
    "hash60",
    "SQL_HASH60",
    "stopword_ratio",
    "punct_ratio",
    "quality_score",
    "lang_id",
    "bpe_tokens",
    "bpe_token_count",
    "fingerprint",
    "shingles",
    "SplitSentences",
    "STOPWORDS",
    "LANG_MARKERS",
]

# Tiny built-in stopword list for quality scoring (English-ish corpus).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# Distinctive-marker lists for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "los", "es", "una"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text; '' -> []."""
    t = F.trim(F.lower(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def hash60(col: Column) -> Column:
    """The repo's 60-bit md5 payload hash (perf convention: narrow
    8-byte keys on reused exchanges instead of shuffling full strings).
    SQL twin: ``SQL_HASH60``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


SQL_HASH60 = "('0x' || substr(md5({c}), 1, 15))::BIGINT"


def bigrams(toks: Column, combine, out_type: str = "array<string>") -> Column:
    """Adjacent-token pairs WITH multiplicity: zip the token array
    against its own tail and merge each pair with ``combine``; arrays
    shorter than 2 yield an empty array of ``out_type``.  SQL twin (used
    verbatim by the DSIR and bigram-LM oracles): ``FROM ...,
    unnest(range(1, len(t))) AS u(i)`` over ``t[i]``/``t[i+1]``."""
    return F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            combine,
        ),
    ).otherwise(F.array().cast(out_type))


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (0.0 for empty docs)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks).cast("double")
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    clean = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(clean).cast("double") / F.length(text).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + low punctuation noise.  The standard pre-training filter shape
    (length/punct/stopword ratios)."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    sw = stopword_ratio(text)
    sw_ok = F.when((sw > 0.01) & (sw < 0.8), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) < 0.2, 1.0).otherwise(0.0)
    return F.round((len_ok + sw_ok + punct_ok) / F.lit(3.0), 4)


def lang_id(text: Column) -> Column:
    """Marker-stopword language ID: the language whose marker list hits the
    most tokens wins; ties and zero hits -> 'und'.  Deterministic, fully
    JVM-side."""
    toks = tokens(text)

    def _hits(markers: list[str]) -> Column:
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda tok: F.array_contains(arr, tok)))

    scores = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    # Deterministic tie-break: first language (in LANG_MARKERS order) hitting max.
    expr = F.lit("und")
    for lang in reversed(langs):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# GPT-2-ish pre-tokenization over lowercased text: letter runs, digit
# runs, and single punctuation marks each become one token.  RE2/Java-regex
# portable so DuckDB oracles can reproduce counts exactly.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokens (the unit a subword tokenizer would split)."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token multiset.  Two docs that are word-order shuffles of each other
    collide — the cheap near-dup key before MinHash."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the MinHash/Jaccard unit).

    O(tokens) per doc: n-1 shifted copies of the token array are zipped and
    each struct concatenated — higher-order functions are interpreted (no
    codegen), so the naive one-``slice``-per-position form is O(tokens^2)
    and measured ~4x slower.  Docs with fewer than ``n`` tokens produce an
    empty set."""
    toks = tokens(text)
    shifted = [toks] + [F.slice(toks, k + 1, 1 << 30) for k in range(1, n)]
    zipped = F.arrays_zip(*shifted)  # padded to size(toks); tail structs hold nulls
    sh = F.transform(
        F.slice(zipped, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)]),
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(sh)
    )


try:  # pyspark >= 4: Python UDTF (table-valued function) surface
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence: string, n_tokens: int")
    class SplitSentences:
        """Sentence-split table function: one input document -> N rows.

        This is the engine's designated seam for real NLP segmenters
        (spaCy/BPE/sentencepiece): a Python UDTF gives row->rows semantics
        that pure SQL lacks when the segmenter is a library call.  The
        built-in rule is deliberately regex-portable (split on
        ``[.!?]\\s+`` — RE2-safe, no lookbehind) so DuckDB can oracle-check
        the plumbing exactly; swap ``eval`` internals for a real model.
        UDTFs are row-at-a-time Python — keep off the 100 TB hot path or
        batch the heavy model inside ``terminate``-less eval with care.
        """

        def eval(self, text):  # noqa: D102 — interface fixed by Spark
            import re

            for s in re.split(r"[.!?]\s+", text or ""):
                s = s.strip()
                if s:
                    yield s, len(s.split())

except ImportError:  # pragma: no cover
    SplitSentences = None
