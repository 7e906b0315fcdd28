"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all JVM-side column expressions (no Python in the
hot path), each reproducible in ANSI SQL for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword lists (n-gram heuristic language ID)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "una"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "de", "et", "un", "est", "que"],
}
LANGS = sorted(STOPWORDS)


def tokens_expr(text_col: str = "text") -> str:
    return f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Whitespace/punct token count + a BPE-ish subword estimate
    (ceil(chars/4) per token, the common ~4-chars-per-token heuristic)."""
    toks = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"aggregate({toks}, 0L, (acc, t) -> "
               f"acc + cast(ceil(length(t) / 4.0) as bigint))")
         .alias("n_subwords"))


def _hits(lang: str, text_col: str) -> str:
    words = ",".join(f"'{w}'" for w in STOPWORDS[lang])
    return (f"size(filter({tokens_expr(text_col)}, "
            f"x -> array_contains(array({words}), x)))")


def language_id(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax hits, deterministic tie-break by
    language code; 'und' when no stopword hits at all."""
    hit_cols = [F.expr(_hits(lg, text_col)).alias(f"hits_{lg}")
                for lg in LANGS]
    scored = df.select(F.col(id_col), *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in LANGS])
    pred = F.when(best == 0, F.lit("und"))
    for lg in LANGS:  # sorted => deterministic tie-break
        pred = pred.when(F.col(f"hits_{lg}") == best, F.lit(lg))
    return scored.select(F.col(id_col), pred.alias("lang_pred"),
                         best.alias("stopword_hits"))


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: alpha ratio, stopword ratio,
    length saturation — the standard cheap pre-filter for training data."""
    toks = tokens_expr(text_col)
    n_chars = f"greatest(length({text_col}), 1)"
    alpha_ratio = (f"length(regexp_replace({text_col}, '[^A-Za-z]', ''))"
                   f" / cast({n_chars} as double)")
    all_stops = ",".join(f"'{w}'" for ws in STOPWORDS.values() for w in ws)
    stop_ratio = (f"size(filter({toks}, x -> array_contains("
                  f"array({all_stops}), x))) / "
                  f"cast(greatest(size({toks}), 1) as double)")
    len_score = f"least(length({text_col}) / 500.0, 1.0)"
    return df.select(
        F.col(id_col),
        F.round(F.expr(f"0.5 * ({alpha_ratio}) + 0.3 * ({stop_ratio}) "
                       f"+ 0.2 * ({len_score})"), 4).alias("quality"))


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercased, punctuation-
    collapsed text) — stable under formatting noise."""
    norm = (f"trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' '))")
    return df.select(F.col(id_col),
                     F.expr(f"md5({norm})").alias("fingerprint"),
                     F.expr(f"length({norm})").alias("norm_len"))
