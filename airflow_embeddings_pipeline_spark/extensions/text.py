"""Text analysis operators (X4): tokenization, language-ID heuristic,
quality scoring, document fingerprinting.

All pure built-in expressions — `split` / higher-order array functions
/ `md5` — so they run JVM-side inside WholeStageCodegen and scale
linearly with no shuffle (per-row derivations).  A 100 TB corpus pass
is a single map stage; only the aggregations that follow shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword list for the language-ID heuristic.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the baseline token counter)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenizer: word pieces, numbers, punctuation runs —
    the public GPT-2 pre-tokenizer shape (contractions, letter runs,
    digit runs, non-space symbol runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(
        c, F.lit(r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"), 0
    )


def stopword_hits(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Count of stopword tokens — the language-ID signal."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords)))


def lang_id(text: Column | str, threshold: float = 0.04) -> Column:
    """Heuristic language ID: stopword density over whitespace tokens.
    Real-corpus variant would use char n-gram profiles per language;
    the fixture vocabulary is English-ish so one profile suffices."""
    n = token_count(text)
    hits = stopword_hits(text)
    ratio = hits / F.when(n > 0, n).otherwise(F.lit(1))
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punctuation and
    stopword ratios — the standard pre-training quality filters."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_distinct_tokens": n_distinct,
        "punct_ratio": F.round(n_punct / F.when(n_chars > 0, n_chars).otherwise(1), 6),
        "distinct_ratio": F.round(n_distinct / F.when(n_tok > 0, n_tok).otherwise(1), 6),
        "stopword_ratio": F.round(
            stopword_hits(c) / F.when(n_tok > 0, n_tok).otherwise(1), 6
        ),
        "mean_token_len": F.round(
            (n_chars - (n_tok - 1)) / F.when(n_tok > 0, n_tok).otherwise(1), 6
        ),
    }


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowered
    text — the exact-dedup key (content hash)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))
