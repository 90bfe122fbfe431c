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


# ------------------------------------------------------------- winnowing
# Rolling-hash fingerprinting (winnowing, Schleimer et al. 2003):
# hash every word k-gram (rolling window over the token stream), then
# keep the minimum hash of each window of w consecutive k-gram hashes.
# The selected-hash set is a position-insensitive document sketch —
# shared substrings of length ≥ k+w-1 words always contribute a common
# fingerprint, the property plagiarism/near-dup detection relies on.
# Pure built-in expressions (one codegen'd map stage, no shuffle).
_FP_P = (1 << 31) - 1


def rolling_kgram_hashes(text: Column | str, k: int = 3, fast: bool = False) -> Column:
    """Hash of every consecutive word k-gram, in order (NOT distinct —
    the rolling window needs positional hashes).

    ``fast=True`` swaps md5-hex-parse for native ``xxhash64`` — ~3×
    cheaper per k-gram and the right choice at corpus scale; the md5
    form exists because DuckDB can reproduce it exactly (oracle
    parity), xxhash64 it cannot."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(0)))
    if fast:
        return F.transform(
            idx,
            lambda i: F.pmod(F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))), F.lit(_FP_P)),
        )
    return F.transform(
        idx,
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 15), 16, 10
        ).cast("long")
        % _FP_P,
    )


def winnow_from_hashes(hashes: Column, w: int = 4) -> Column:
    """Winnowing sketch from a *materialized* rolling-hash array
    column: distinct sorted min-hashes, one per window of ``w``
    consecutive k-gram hashes.

    Take the hash array as a bound column, NOT an inline expression —
    Catalyst does not CSE inside higher-order functions, so an inline
    ``rolling_kgram_hashes(...)`` would be re-evaluated (n·md5 calls)
    once per window element: O(n²) hashing.  Materializing the array in
    a prior projection keeps winnowing O(n·w) integer ops."""
    win_idx = F.sequence(F.lit(1), F.greatest(F.size(hashes) - (w - 1), F.lit(0)))
    mins = F.transform(win_idx, lambda i: F.array_min(F.slice(hashes, i, w)))
    return F.array_sort(F.array_distinct(mins))


def rolling_kgram_hashes_sql(text_expr: str, k: int = 3) -> str:
    p = _FP_P
    toks = f"string_split({text_expr}, ' ')"
    return (
        f"list_transform(range(1, greatest(len({toks}) - {k - 1}, 0) + 1), "
        f"i -> CAST(concat('0x', substring(md5(array_to_string({toks}[i:i+{k - 1}], ' ')), 1, 15)) AS BIGINT) % {p})"
    )


def winnow_from_hashes_sql(hashes_expr: str, w: int = 4) -> str:
    """DuckDB fragment mirroring ``winnow_from_hashes``; pass a column
    reference to a (materialized) hash-array CTE, same O(n²) caveat."""
    return (
        f"list_sort(list_distinct(list_transform("
        f"range(1, greatest(len({hashes_expr}) - {w - 1}, 0) + 1), "
        f"i -> list_min(({hashes_expr})[i:i+{w - 1}]))))"
    )


def chunk_tokens(
    text: Column | str, *, window: int = 32, stride: int = 24
) -> Column:
    """Overlapping token-window chunks — the split-before-embed step of
    an embeddings pipeline (the reference embeds whole docs,
    embeddings-pipeline.py:316; chunking is how the same pipeline
    handles documents longer than the encoder context).

    Returns ``array<struct<chunk_id int, chunk_text string,
    n_tokens int>>``: windows of ``window`` tokens starting every
    ``stride`` tokens (overlap = window - stride), last partial window
    kept.  Pure codegen'd array expression — explode downstream to get
    one row per chunk, which keeps the op map-only (no shuffle)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(c, " ")
    n = F.size(toks)
    # chunk starts: 1, 1+stride, ... while start <= n (1-based)
    n_chunks = F.when(
        n <= window, F.lit(1)
    ).otherwise(
        F.ceil((n - window).cast("double") / stride).cast("int") + 1
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, window)).alias(
                "chunk_text"
            ),
            F.least(n - i * stride, F.lit(window)).cast("int").alias("n_tokens"),
        ),
    )
