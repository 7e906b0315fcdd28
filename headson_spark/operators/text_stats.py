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
    win_fp as long as the minimizing window survives.

    Round 6 (guide §4.2): computed in a mapInPandas numpy kernel instead
    of the round-4 Catalyst fold. Both fingerprints are EXACT modular
    integers — c_i are ASCII codes of the normalized text (pure
    [a-z0-9 ] after lower + strip, where Python bytes == Java ascii()),
    and every window hash is the well-defined residue
    sum(c_j * B^(i+w-1-j)) mod M — so ANY correct evaluation strategy is
    bit-identical; there is no float-ordering concern at all. The numpy
    form evaluates all window hashes from the direct polynomial
    (sliding_window_view x precomputed powers, products reduced mod M
    before an overflow-safe chunked sum), which vectorizes the entire
    per-document O(len*window) work in C. The Catalyst fold kept the
    named_struct-per-element rolling update whose allocation cost
    dominated the row (2.6-3.6 s at sf1.0 -> ~1.0 s). The DuckDB oracle
    keeps its straightforward windowed refold — equal residues by
    modular arithmetic (oracle-verified at sf0.001/0.01/0.1).

    Overflow accounting (int64): c*B^j products are <= 255 * (M-1)
    ~ 2.3e18 < 2^63 before their mod; the mod-reduced terms (< M ~
    9e15) sum in chunks of 512 (< 4.6e18 < 2^63) with a mod between
    chunks. doc_fp uses the same polynomial form over the whole
    document."""
    import re as _re

    import numpy as np

    strip = _re.compile("[^a-z0-9]+")
    B, M, W = RH_BASE, RH_MOD, window
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_t}, doc_fp bigint, win_fp bigint, "
                  f"norm_len int")

    def _mod_sum_last(prods: "np.ndarray") -> "np.ndarray":
        # sum of mod-reduced int64 terms (last axis) without overflow:
        # partial sums of <=512 terms (each < M ~ 9e15) stay under 2^62
        total = np.zeros(prods.shape[:-1], dtype=np.int64)
        for s in range(0, prods.shape[-1], 512):
            total = (total + prods[..., s:s + 512].sum(axis=-1)) % M
        return total

    def fp_one(norm_bytes: bytes) -> tuple:
        c = np.frombuffer(norm_bytes, dtype=np.uint8).astype(np.int64)
        n = len(c)
        if n == 0:
            return 0, 0, 0
        # doc_fp: Horner fold (h*B + c_i) mod M — h*B+c < M*257 < 2^63
        pw_n = _POWERS_CACHE(n)
        doc_fp = int(_mod_sum_last((c * pw_n[n - 1::-1]) % M))
        if n <= W:
            return doc_fp, doc_fp, n
        wins = np.lib.stride_tricks.sliding_window_view(c, W)
        win_h = _mod_sum_last((wins * pw_n[W - 1::-1]) % M)
        return doc_fp, int(win_h.min()), n

    # powers of B mod M, grown on demand and cached per python worker
    _pcache: dict = {}

    def _POWERS_CACHE(n: int) -> "np.ndarray":
        p = _pcache.get("p")
        if p is None or len(p) < n:
            size = max(n, 4096)
            out = np.empty(size, dtype=np.int64)
            out[0] = 1
            for i in range(1, size):
                out[i] = (out[i - 1] * B) % M
            p = _pcache["p"] = out
        return p

    def fp_batches(pdfs):
        import pandas as pd
        for pdf in pdfs:
            ids, dfs_, wfs, lens = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                norm = strip.sub(" ", (t or "").lower()).strip()
                d, w, ln = fp_one(norm.encode("ascii"))
                ids.append(i)
                dfs_.append(d)
                wfs.append(w)
                lens.append(ln)
            yield pd.DataFrame({id_col: ids, "doc_fp": dfs_,
                                "win_fp": wfs, "norm_len": lens})

    return df.select(id_col, text_col).mapInPandas(fp_batches, out_schema)


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
