"""Text analysis for training-data curation: token counting, quality
scoring, language-ID, document fingerprinting.

Everything here that CAN be a built-in Spark expression IS one (JVM-side,
whole-stage-codegen'd); only the fingerprint (needs mmh3 parity with the
sketch layer) drops to a vectorized Arrow kernel."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# A tiny stopword table per language for the n-gram/stopword heuristic.
# Real deployments swap in fasttext/cld3 — the *shape* (scoring against
# per-language marker sets, argmax) is what the pipeline needs.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "de": ["der", "und", "die", "nicht", "das", "ist"],
    "es": ["el", "que", "los", "una", "por", "como"],
    "fr": ["le", "les", "des", "est", "dans", "une"],
    "zh": ["的", "是", "在", "了", "和", "有"],
}


def token_count(col) -> Column:
    """Whitespace token count (codegen'd; no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_ish_token_count(col) -> Column:
    """BPE-ish subword proxy: count of word pieces + digit runs + punct
    marks — the standard cheap pre-tokenizer estimate (regex, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(c, r"(?=[A-Z])|[\s]+|(?<=[a-z])(?=[0-9])")
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.size(pieces) + punct


def char_classes(col) -> dict[str, Column]:
    """Length / punctuation / alpha / digit / whitespace counts, all
    regexp_replace-based (exactly reproducible in the SQL oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return {
        "n_chars": n,
        "n_alpha": n - F.length(F.regexp_replace(c, r"[A-Za-z]", "")),
        "n_digit": n - F.length(F.regexp_replace(c, r"[0-9]", "")),
        "n_punct": n - F.length(F.regexp_replace(c, r"[^\w\s]", "")),
        "n_space": n - F.length(F.regexp_replace(c, r"\s", "")),
    }


def quality_score(col) -> Column:
    """Composite curation score in [0,1]: length band + alpha ratio −
    punctuation excess (the C4/Gopher-style cheap filters, as one column)."""
    c = F.col(col) if isinstance(col, str) else col
    cc = char_classes(c)
    n = cc["n_chars"].cast("double")
    alpha_ratio = cc["n_alpha"] / F.greatest(n, F.lit(1.0))
    punct_ratio = cc["n_punct"] / F.greatest(n, F.lit(1.0))
    len_ok = F.when((n >= 50) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.5))
    score = len_ok * (F.lit(0.7) * alpha_ratio + F.lit(0.3) * (1 - punct_ratio))
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 6)


def lang_id(col) -> Column:
    """Marker-token language-ID: score = count of language marker tokens
    present; argmax wins, 'und' (undetermined) when nothing matches.
    Pure Catalyst: one pass of token containment per language."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.split(F.lower(F.trim(c)), r"\s+"))
    scores = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    best = F.greatest(*scores)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint_col(spark: SparkSession, col, normalized: bool = True) -> Column:
    """64-bit document fingerprint: mmh3_x64_64 of (optionally
    whitespace-normalized, lowercased) text — the same hash kernel as the
    sketch layer, so fingerprints and bloom memberships agree."""
    c = F.col(col) if isinstance(col, str) else col
    if normalized:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))

    @F.pandas_udf("long")
    def _fp(s: pd.Series) -> pd.Series:
        import numpy as np
        import pyarrow as pa

        from sketchlib import mmh3

        arr = pa.Array.from_pandas(s.astype("string"), type=pa.large_string())
        data, off = mmh3.arrow_string_buffers(arr)
        return pd.Series(mmh3.mmh3_x64_64(data, off).astype(np.int64))

    return _fp(c)
