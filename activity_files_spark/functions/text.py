"""Text-analysis kernels: token stats, quality scoring, language ID,
document fingerprinting. All native Column expressions with SQL twins so
the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny embedded stopword lists (public, common-knowledge word sets)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
}


def token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_sql(expr: str) -> str:
    return rf"len(regexp_split_to_array(trim({expr}), '\s+'))"


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (lowercased)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))
    )
    return hits.cast("double") / F.size(toks).cast("double")


def stopword_ratio_sql(expr: str, lang: str = "en") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        rf"(len(list_filter(regexp_split_to_array(lower(trim({expr})), '\s+'),"
        rf" t -> list_contains([{words}], t))) * 1.0"
        rf" / len(regexp_split_to_array(lower(trim({expr})), '\s+')))"
    )


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: penalize very short docs, low alpha ratio,
    low stopword ratio. Deterministic arithmetic (same op order as the SQL
    twin)."""
    n_tok = token_count(text).cast("double")
    len_c = F.length(text).cast("double")
    alpha = (
        F.length(F.regexp_replace(text, r"[^a-zA-Z ]", "")).cast("double")
        / F.greatest(len_c, F.lit(1.0))
    )
    sw = stopword_ratio(text, "en")
    len_term = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    sw_term = F.least(sw * F.lit(5.0), F.lit(1.0))
    return F.round((len_term + alpha + sw_term) / F.lit(3.0), 6)


def quality_score_sql(expr: str) -> str:
    n_tok = f"CAST({token_count_sql(expr)} AS DOUBLE)"
    len_c = f"CAST(length({expr}) AS DOUBLE)"
    alpha = (
        f"(CAST(length(regexp_replace({expr}, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)"
        f" / greatest({len_c}, 1.0))"
    )
    sw = stopword_ratio_sql(expr, "en")
    return (
        f"ROUND((least({n_tok} / 20.0, 1.0) + {alpha} + least({sw} * 5.0, 1.0)) / 3.0, 6)"
    )


def lang_id(text: Column) -> Column:
    """Pick the language with the highest stopword ratio; 'und' if all 0."""
    scores = [(lang, stopword_ratio(text, lang)) for lang in ("en", "de", "fr")]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reversed so earlier languages win ties (en > de > fr priority)
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), lang).otherwise(expr)
    return expr


def lang_id_sql(expr: str) -> str:
    en = stopword_ratio_sql(expr, "en")
    de = stopword_ratio_sql(expr, "de")
    fr = stopword_ratio_sql(expr, "fr")
    best = f"greatest({en}, {de}, {fr})"
    return (
        f"CASE WHEN {en} = {best} AND {best} > 0 THEN 'en' "
        f"WHEN {de} = {best} AND {best} > 0 THEN 'de' "
        f"WHEN {fr} = {best} AND {best} > 0 THEN 'fr' ELSE 'und' END"
    )


def text_profile(df, text_col: str = "text", id_col: str = "doc_id"):
    """lang_id + quality_score + fingerprint in ONE pass with the shared
    subtrees (the per-language split/filter stopword ratios, token count,
    alpha length) staged in an intermediate projection, so each appears in
    the generated code exactly once. Catalyst keeps the stage because the
    aliases are non-cheap and multiply referenced (CollapseProject's
    use-count rule); the round-2 single-projection form duplicated each
    stopword-ratio tree ~5x and paid ~4s of one-time codegen compile.
    Bit-identical to lang_id/quality_score/fingerprint (same op order).
    """
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        t.alias("_t"),
        *[
            stopword_ratio(t, lang).alias(f"_sw_{lang}")
            for lang in ("en", "de", "fr")
        ],
        token_count(t).cast("double").alias("_n_tok"),
        F.length(t).cast("double").alias("_len"),
        F.length(F.regexp_replace(t, r"[^a-zA-Z ]", "")).cast("double").alias("_alpha_len"),
    )
    best = F.greatest(F.col("_sw_en"), F.col("_sw_de"), F.col("_sw_fr"))
    lang_expr = F.lit("und")
    for lang in ("fr", "de", "en"):  # reversed: earlier languages win ties
        s = F.col(f"_sw_{lang}")
        lang_expr = F.when((s == best) & (best > 0), lang).otherwise(lang_expr)
    alpha = F.col("_alpha_len") / F.greatest(F.col("_len"), F.lit(1.0))
    quality = F.round(
        (
            F.least(F.col("_n_tok") / F.lit(20.0), F.lit(1.0))
            + alpha
            + F.least(F.col("_sw_en") * F.lit(5.0), F.lit(1.0))
        )
        / F.lit(3.0),
        6,
    )
    return staged.select(
        F.col(id_col),
        lang_expr.alias("lang_guess"),
        quality.alias("quality"),
        fingerprint(F.col("_t")).alias("fp"),
    )


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: lowercase, collapse whitespace, md5."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def fingerprint_sql(expr: str) -> str:
    return rf"md5(regexp_replace(lower(trim({expr})), '\s+', ' ', 'g'))"
