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


EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]"


def pii_mask(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Mask emails/phone-shaped spans and count them — the standard
    pre-training scrub pass, pure regexp column expressions."""
    masked = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE, "<PHONE>")
    n_emails = F.size(F.expr(
        f"regexp_extract_all({text_col}, '{EMAIL_RE}', 0)"))
    return df.select(
        F.col(id_col), masked.alias("masked_text"),
        n_emails.cast("int").alias("n_emails"),
        F.length(masked).cast("bigint").alias("masked_len"))


def repetition_ratio(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Boilerplate signal: fraction of duplicate word-trigrams
    (1 - distinct/total); high values flag template/repetitive text."""
    toks = tokens_expr(text_col)
    tri = (f"transform(sequence(1, greatest(size({toks}) - 2, 1)), "
           f"i -> array_join(slice({toks}, i, 3), ' '))")
    return df.select(
        F.col(id_col),
        F.round(F.expr(
            f"1.0 - size(array_distinct({tri})) / "
            f"cast(greatest(size({tri}), 1) as double)"), 4)
         .alias("rep_ratio"))


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercased, punctuation-
    collapsed text) — stable under formatting noise."""
    norm = (f"trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' '))")
    return df.select(F.col(id_col),
                     F.expr(f"md5({norm})").alias("fingerprint"),
                     F.expr(f"length({norm})").alias("norm_len"))


# polynomial rolling-hash parameters: base 257 over a prime modulus just
# under 2^53 so acc*base + c stays < 2^63 (no int64 overflow — Spark's
# non-ANSI wrap and DuckDB would disagree past that)
RH_BASE = 257
RH_MOD = 9007199254740881


def rolling_fingerprint(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        window: int = 16) -> DataFrame:
    """Rolling-hash document fingerprint (Rabin-Karp polynomial over the
    normalized text): `doc_fp` = hash of the whole document — exact-dup
    key robust to formatting noise; `win_fp` = the MINIMUM hash over all
    `window`-length character windows (winnowing-style) — shift-invariant,
    so a document with content inserted at the front keeps the same
    win_fp as long as the minimizing window survives. Pure integer column
    expressions (left-fold, wrap-free by modulus choice), bit-identical
    in the DuckDB oracle; cost is O(len·window) inside whole-stage
    codegen — no Python, no shuffle."""
    norm = (f"trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' '))")
    # STAGE both intermediates: a lambda body is re-instantiated per
    # element (no CSE across higher-order functions — the simhash
    # lesson), so norm-inside-the-lambda would re-run the regexp O(len)
    # times, and substring(s, i, 1) is an O(i) scan making per-index
    # char extraction O(len^2); split('') extracts every char in one
    # pass (measured: 18.4 s -> 1.7 s at sf0.1 together with the O(len)
    # rolling update below).
    codes = "transform(split(_norm, ''), c -> cast(ascii(c) as bigint))"
    staged = (df.withColumn("_norm", F.expr(norm))
                .withColumn("_codes", F.expr(codes)))
    fold = (f"(acc, c) -> (acc * {RH_BASE} + c) % {RH_MOD}")
    doc_fp = f"aggregate(_codes, 0L, {fold})"
    # win_fp via the classic O(len) rolling update — drop the outgoing
    # char, shift, add the incoming one:
    #   h' = ((h - c_out*B^(w-1)) * B + c_in) mod M
    # (a naive per-window refold is O(len*window) and measured 18 s at
    # sf0.1 vs <1 s for this form; bit-identical by modular arithmetic,
    # which is why the DuckDB oracle can keep the straightforward
    # windowed refold). All intermediates stay under 2^63:
    # 2M*B ~ 4.6e18 < 9.2e18.
    bw1 = pow(RH_BASE, window - 1, RH_MOD)
    init_h = f"aggregate(slice(_codes, 1, {window}), 0L, {fold})"
    new_h = (f"((acc.h + {RH_MOD} - element_at(_codes, i - {window}) "
             f"* {bw1}L % {RH_MOD}) % {RH_MOD} * {RH_BASE} "
             f"+ element_at(_codes, i)) % {RH_MOD}")
    win_fp = (f"case when size(_codes) > {window} then "
              f"aggregate(sequence({window + 1}, size(_codes)), "
              f"named_struct('h', {init_h}, 'mn', {init_h}), "
              f"(acc, i) -> named_struct('h', {new_h}, "
              f"'mn', least(acc.mn, {new_h})), "
              f"acc -> acc.mn) else {init_h} end")
    return staged.select(
        F.col(id_col),
        F.expr(doc_fp).alias("doc_fp"),
        F.expr(win_fp).alias("win_fp"),
        F.expr("length(_norm)").cast("int").alias("norm_len"))


def top_terms(df: DataFrame, k: int = 3, id_col: str = "doc_id",
              text_col: str = "text", n_docs: int | None = None
              ) -> DataFrame:
    """Top-k most characteristic terms per document: rank by
    tf * (N + 1) / (df + 1) — term frequency weighted by smoothed inverse
    document frequency. The rational idf variant (no log) is chosen
    deliberately: IEEE multiply/divide are correctly rounded, so the
    score doubles are BIT-IDENTICAL across engines, while libm log()
    differs in the last ulp between JVM and DuckDB and can flip
    rank-boundary ties.

    Scale shape (100 TB): explode -> two map-side-combined aggregations
    (tf by (doc, term); df by term) -> term-frequency dim joined back ->
    per-doc window top-k. No all-pairs, no driver loops. The dim-join
    strategy is deliberately left to AQE: at bench scale the vocabulary
    is tiny and AQE picks a broadcast join from the MEASURED size of the
    dfreq aggregate; at 100 TB the distinct-term table is O(vocabulary)
    — potentially tens of GB — and a forced broadcast hint would bypass
    the size check and OOM the executors, so AQE degrades it to a
    shuffled join on `term` instead. N (the corpus document count) rides
    in as a broadcast cross join of a one-row aggregate — no driver-side
    count() action per invocation.
    """
    from pyspark.sql import Window

    toks = tokens_expr(text_col)
    tf = (df.select(F.col(id_col), F.explode(F.expr(toks)).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    if n_docs is not None:
        n1 = F.lit(float(n_docs + 1))
    else:
        ndocs = df.agg((F.count("*").cast("double") + F.lit(1.0))
                       .alias("_n1"))
        tf = tf.crossJoin(F.broadcast(ndocs))  # one row — always safe
        n1 = F.col("_n1")
    scored = (tf.join(dfreq, "term")
                .withColumn("score",
                            (F.col("tf") * n1) / (F.col("df_t") + F.lit(1.0)))
                .drop("_n1"))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"),
                                           F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col(id_col), "term",
                          F.col("tf").cast("bigint").alias("tf"),
                          F.col("df_t").cast("bigint").alias("df_t"),
                          "score", F.col("rank").cast("int")
                          .alias("rank")))
