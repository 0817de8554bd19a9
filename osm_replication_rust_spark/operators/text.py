"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristics, document fingerprinting.

Everything except the rolling fingerprint is pure JVM expression work
(whole-stage codegen; also ANSI-SQL-expressible for the oracle). The
fingerprint is an Arrow-batched numpy kernel (a polynomial rolling hash
has inherently sequential structure per document, but vectorizes across
the batch dimension).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string -> 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def sql_token_count(text: str) -> str:
    return (
        f"CASE WHEN length(trim({text})) = 0 THEN 0 "
        f"ELSE len(string_split_regex(trim({text}), '\\s+')) END"
    )


def occurrences(text: Column, needle: str) -> Column:
    """Occurrence count via length arithmetic — identical semantics in
    Spark and ANSI SQL (no regex dialect differences)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def sql_occurrences(text: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (
        f"CAST((length({text}) - length(replace({text}, '{esc}', ''))) / {len(needle)} AS BIGINT)"
    )


def stopword_hits(text: Column) -> Column:
    """Stopword occurrences, counted as bounded words (space-padded)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    total = F.lit(0).cast("long")
    for w in STOPWORDS:
        total = total + occurrences(padded, f" {w} ")
    return total


def sql_stopword_hits(text: str) -> str:
    padded = f"(' ' || {text} || ' ')"
    return " + ".join(sql_occurrences(padded, f" {w} ") for w in STOPWORDS)


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality signals: length, tokens, mean token length,
    stopword ratio, punctuation count — the standard cheap filters of a
    pretraining pipeline, all codegen'd expressions."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.length(t) / F.greatest(n_tok, F.lit(1))).alias("mean_tok_len"),
        (stopword_hits(t) / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
        (occurrences(t, ".") + occurrences(t, ",") + occurrences(t, "!")).alias(
            "n_punct"
        ),
    )


def lang_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """n-gram-heuristic language ID: per-language marker-token hit
    counts; predicted = argmax (ties -> lexicographic, deterministic).
    Tuned for fixtures, but the operator shape (per-language scores +
    argmax over a struct array) is the real thing."""
    markers = {
        "en": (" the ", " and ", " is "),
        "de": (" der ", " und ", " ist "),
        "fr": (" le ", " et ", " est "),
        "es": (" el ", " y ", " es "),
    }
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = [
        F.struct(
            sum((occurrences(t, m) for m in ms), F.lit(0).cast("long")).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, ms in sorted(markers.items())
    ]
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        best["lang"].alias("pred_lang"),
        best["score"].alias("pred_score"),
    )


def fingerprint_udf():
    """64-bit polynomial rolling-hash document fingerprint (karp-rabin
    style over bytes), Arrow-batched. The per-doc loop is sequential but
    tiny; numpy vectorizes over characters."""

    @F.pandas_udf(T.LongType())
    def fp(text: pd.Series) -> pd.Series:
        B = np.uint64(1000003)
        out = np.zeros(len(text), dtype=np.uint64)
        for i, s in enumerate(text):
            if s is None:
                continue
            b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            h = np.uint64(1469598103934665603)
            # horner evaluation; uint64 wraparound is the hash semantics
            with np.errstate(over="ignore"):
                for x in b:
                    h = h * B + x
            out[i] = h
        return pd.Series(out.astype(np.int64))

    return fp
