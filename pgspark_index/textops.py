"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. Pure pyspark.sql expressions (codegen'd, no UDFs),
each with an exactly-equivalent DuckDB SQL spelling for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import TOKEN_PATTERN, hash60

# tiny seeded stopword lists per language (n-gram-free heuristic id)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "dans"],
    "es": ["el", "la", "los", "y", "es", "en"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority


def _tok_array(text_col):
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), 0)


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language guess -> (doc_id, lang_guess).

    score(lang) = count of tokens in lang's stopword list; argmax with
    fixed priority order on ties; 'und' (undetermined) when all zero."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tok_array(F.col(text_col)).alias("toks")
    )
    scores = toks.select(
        "doc_id",
        *[
            F.size(F.filter(F.col("toks"), lambda t: t.isin(STOPWORDS[lang]))).alias(
                f"s_{lang}"
            )
            for lang in LANG_ORDER
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    guess = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:  # first lang reaching the max wins (tie-break)
        guess = guess.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scores.select("doc_id", guess.alias("lang_guess"))


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + score per doc:
    (doc_id, n_tokens, uniq_ratio, stopword_ratio, mean_token_len, quality)

    quality = 0.4*min(n_tokens/100,1) + 0.3*uniq_ratio + 0.3*min(4*stop_ratio,1)
    — length, lexical diversity, and natural-language-likeness, the classic
    pretraining-filter trio. All ratios rounded to 4dp for oracle parity."""
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    t = docs.select(
        F.col(id_col).alias("doc_id"), _tok_array(F.col(text_col)).alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_uniq"),
        F.size(F.filter(F.col("toks"), lambda x: x.isin(all_stop))).alias("n_stop"),
        F.aggregate(
            F.transform(F.col("toks"), lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("len_sum"),
    )
    nz = F.greatest(F.col("n_tokens"), F.lit(1))
    # round via floor(x*1e4 + 0.5)/1e4: unlike round(), identical across
    # engines when the unrounded double is identical (integer ratios here
    # produce exact .00005-boundary doubles where round() implementations
    # disagree)
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return t.select(
        "doc_id",
        "n_tokens",
        r4(F.col("n_uniq") / nz).alias("uniq_ratio"),
        r4(F.col("n_stop") / nz).alias("stopword_ratio"),
        r4(F.col("len_sum") / nz).alias("mean_token_len"),
        r4(
            0.4 * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
            + 0.3 * (F.col("n_uniq") / nz)
            + 0.3 * F.least(4.0 * F.col("n_stop") / nz, F.lit(1.0))
        ).alias("quality"),
    )


def token_counts_by(
    docs: DataFrame, group_col: str = "source", id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus token accounting per group: whitespace tokens vs regex tokens
    (the BPE-ish proxy) -> (group, n_docs, ws_tokens, re_tokens)."""
    return (
        docs.select(
            F.col(group_col).alias("grp"),
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws"),
            F.size(_tok_array(F.col(text_col))).alias("re_"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("re_").alias("re_tokens"),
        )
    )


def fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mod: int = 8,
) -> DataFrame:
    """Mod-p selection fingerprint (winnowing-lite): hash each token bigram,
    keep those with h % mod == 0 -> (doc_id, n_grams, n_selected,
    fp = md5 of the sorted selected hashes).

    The selected-gram set is a deterministic ~1/mod sample of each doc's
    shingles — two docs sharing most bigrams share most fingerprints."""
    grams = docs.select(
        F.col(id_col).alias("doc_id"), _tok_array(F.col(text_col)).alias("toks")
    ).select(
        "doc_id",
        F.expr(
            # sequence(1,0) would DESCEND in Spark — guard short docs explicitly
            "IF(size(toks) < 2, array(), "
            "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], '_', toks[i])))"
        ).alias("grams"),
    )
    sel = grams.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.array_sort(
            F.array_distinct(
                F.filter(
                    F.transform(F.col("grams"), lambda g: hash60(g)),
                    lambda h: h % mod == 0,
                )
            )
        ).alias("sel"),
    )
    return sel.select(
        "doc_id",
        "n_grams",
        F.size("sel").alias("n_selected"),
        F.md5(F.array_join(F.transform("sel", lambda h: h.cast("string")), ",")).alias("fp"),
    )
