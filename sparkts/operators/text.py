"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure Spark expressions (codegen'd) — designed to
run inside the extraction stage of a 100 TB pipeline without adding a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Minimal stopword profiles (top function words) per language — enough for a
# coarse n-gram/stopword heuristic language ID. Real pipelines plug a model
# here; the operator contract (argmax over per-language evidence scores)
# stays the same.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "los", "por", "con", "una", "para", "es"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "pour", "que", "une"],
    "pt": ["o", "a", "de", "que", "os", "uma", "para", "com", "nao", "mais"],
    "it": ["il", "la", "di", "che", "per", "con", "una", "sono", "del", "non"],
    "nl": ["de", "het", "een", "van", "en", "dat", "is", "op", "te", "met"],
}


def tokens_col(text_col: str = "text") -> F.Column:
    return F.split(F.lower(F.col(text_col)), r"\s+")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax over stopword-hit counts.

    ``array_intersect`` + ``size`` per language — narrow, no shuffle, no UDF.
    Docs with zero evidence get 'und' (undetermined).
    """
    toks = tokens_col(text_col)
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias(
            f"sc_{lang}"
        )
        for lang, ws in STOPWORDS.items()
    ]
    scored = df.select("*", *scores)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"sc_{lg}") for lg in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for lg in langs:  # first max wins → deterministic
        pick = pick.when(F.col(f"sc_{lg}") == best, F.lit(lg))
    return scored.withColumn("lang_pred", pick).drop(
        *[f"sc_{lg}" for lg in langs]
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (letter runs, digit runs, punctuation singletons — the pre-tokenizer
    pattern most BPE vocabularies assume)."""
    ws_tokens = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))
    bpe_ish = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
        )
    )
    return df.withColumn("n_ws_tokens", ws_tokens).withColumn(
        "n_bpe_tokens", bpe_ish
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style quality features + a [0,1] score:

    length, mean word length, punctuation ratio, digit ratio, stopword hit
    ratio, uppercase ratio. The score is a fixed transparent formula —
    downstream filters threshold it (quality_score ≥ 0.5 keeps "clean prose").
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    mean_wlen = (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    all_stop = F.array(
        *[F.lit(w) for ws in STOPWORDS.values() for w in ws]
    )
    stop_hits = F.size(F.array_intersect(toks, all_stop))
    out = (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("mean_word_len", F.round(mean_wlen, 4))
        .withColumn("punct_ratio", F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("digit_ratio", F.round(digits / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("upper_ratio", F.round(upper / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn(
            "stopword_ratio", F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6)
        )
    )
    # transparent linear score, clamped to [0,1]
    raw = (
        F.lit(0.5)
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10), 0.2).otherwise(-0.2)
        + F.when(F.col("punct_ratio") <= 0.2, 0.1).otherwise(-0.2)
        + F.when(F.col("digit_ratio") <= 0.2, 0.1).otherwise(-0.2)
        + F.when((n_chars >= 50) & (n_chars <= 50000), 0.1).otherwise(-0.2)
    )
    return out.withColumn(
        "quality_score", F.round(F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0)), 4)
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: exact (md5 of normalized text) and a rolling
    64-bit content hash (xxhash64 over the normalized token stream) — the
    normalized variants catch whitespace/case-mangled exact dups."""
    norm = F.concat_ws(" ", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    return df.withColumn("fp_md5", F.md5(norm)).withColumn(
        "fp_xx64", F.xxhash64(norm)
    )


# --------------------------------------------------------------------- #
# winnowing fingerprints (rolling hash)
# --------------------------------------------------------------------- #

WINNOW_MOD = 2147483647  # 2^31 - 1
WINNOW_P = 999999937     # prime multiplier < 2^30 (keeps products < 2^61)

def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Document fingerprints by winnowing (Schleimer-Wilkerson-Aiken):
    Rabin-Karp rolling hashes of all k-byte grams, then the minimum hash of
    every ``window`` consecutive grams — guaranteeing any shared substring
    of length ≥ k + window − 1 yields a shared fingerprint.

    Output: (id, fingerprint bigint) exploded rows; near-dup candidates =
    documents sharing fingerprints (groupBy fingerprint → pairs), the same
    bucket-join shape as MinHash-LSH but with locality guarantees on exact
    substrings. Hashing is vectorized numpy inside one Arrow batch pass
    (k scaled adds per doc), polynomial Karp-Rabin mod p = 2^31−1 with
    multiplier P < 2^30 — every intermediate fits a signed 64-bit int, so
    an external SQL engine reproduces the values exactly (the driver
    oracle recomputes this per-position over char codes; ASCII assumed).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        df.schema[id_col],
        T.StructField("fingerprint", T.LongType(), False),
    ])

    def per_doc(buf: bytes) -> np.ndarray:
        b = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        n = b.size
        if n < k:
            return np.unique(b[:1]) if n else np.empty(0, dtype=np.int64)
        m = n - k + 1
        h = np.zeros(m, dtype=np.int64)
        for j in range(k):
            h = (h * WINNOW_P + b[j : j + m]) % WINNOW_MOD
        if h.size <= window:
            sel = np.unique([h.min()])
        else:
            sw = np.lib.stride_tricks.sliding_window_view(h, window)
            sel = np.unique(sw.min(axis=1))
        return sel

    def mapper(batches):
        for pdf in batches:
            ids, fps = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                sel = per_doc(str(txt).encode("utf-8"))
                ids.extend([i] * sel.size)
                fps.extend(sel)
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    return df.select(id_col, text_col).mapInPandas(mapper, schema)
