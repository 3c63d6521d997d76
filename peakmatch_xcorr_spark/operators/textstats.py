"""Text analysis operators for the training-data pipeline, over the
``documents`` table.  Everything is built-in pyspark.sql expressions
(whole-stage codegen); no Python in the hot path.

- language-ID: stopword-hit n-gram heuristic across a small built-in
  profile set (deterministic, no external models)
- quality scoring: length / punctuation / stopword / repetition ratios
- token counting: whitespace tokens + a BPE-ish subword regex count
- document fingerprinting: polynomial rolling hash of normalized text
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# minimal public stopword profiles (top function words per language)
_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "por", "con"],
}


def _tokens(text_col: str):
    # \p{L}\p{N}: Java regex \w is ASCII-only by default — it would
    # blank every CJK/Cyrillic/accented character and silently destroy
    # non-English tokens (multilingual corpora are the norm at 100 TB)
    return F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N}_\s']", " ")),
            r"\s+",
        ),
        lambda t: F.length(t) > 0,
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: fraction of tokens hitting each language's
    stopword profile; argmax wins, 'und' (undetermined) when no profile
    scores above a floor.  Pure array expressions."""
    toks = _tokens(text_col)
    d = docs.withColumn("_toks", toks).withColumn(
        "_n", F.greatest(F.size("_toks"), F.lit(1))
    )
    scores = []
    for lang, words in _PROFILES.items():
        hit = F.size(
            F.filter("_toks", lambda t: t.isin(words))
        ) / F.col("_n")
        scores.append(F.struct(hit.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return (
        d.withColumn(
            "lang_pred",
            F.when(best["score"] >= 0.05, best["lang"]).otherwise(F.lit("und")),
        )
        .withColumn("lang_score", F.round(best["score"], 6))
        .drop("_toks", "_n")
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length band, alpha ratio, punctuation ratio, stopword ratio,
    mean word length band, repetition (distinct/total tokens)."""
    t = F.col(text_col)
    toks = _tokens(text_col)
    n_chars = F.length(t)
    # \p{L}, consistent with _tokens: ASCII [A-Za-z] would score a
    # clean Russian/Japanese doc alpha_ratio ~ 0 and rank it below
    # mediocre English text
    n_alpha = F.length(F.regexp_replace(t, r"[^\p{L}]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    d = (
        docs.withColumn("_toks", toks)
        .withColumn("n_tokens", F.size("_toks"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct("_toks")))
        .withColumn("alpha_ratio", n_alpha / F.greatest(n_chars, F.lit(1)))
        .withColumn("punct_ratio", n_punct / F.greatest(n_chars, F.lit(1)))
        .withColumn(
            "stopword_ratio",
            F.size(F.filter("_toks", lambda x: x.isin(_PROFILES["en"])))
            / F.greatest(F.size("_toks"), F.lit(1)),
        )
        .withColumn(
            "repetition_ratio",
            1 - F.col("n_distinct_tokens") / F.greatest(F.col("n_tokens"), F.lit(1)),
        )
        .withColumn(
            "mean_word_len",
            F.aggregate("_toks", F.lit(0), lambda a, x: a + F.length(x))
            / F.greatest(F.size("_toks"), F.lit(1)),
        )
    )
    length_band = (
        F.when(F.col("n_tokens") < 5, 0.2)
        .when(F.col("n_tokens") < 20, 0.7)
        .when(F.col("n_tokens") <= 2000, 1.0)
        .otherwise(0.8)
    )
    wl_band = (
        F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10), 1.0)
        .otherwise(0.5)
    )
    composite = (
        0.3 * length_band
        + 0.2 * F.col("alpha_ratio")
        + 0.2 * (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0)))
        + 0.15 * (1 - F.col("repetition_ratio"))
        + 0.15 * wl_band
    )
    return d.withColumn("quality", F.round(composite, 6)).drop("_toks")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (the regex
    families GPT-style tokenizers use: word pieces, numbers, punct
    runs) + a chars/4 heuristic."""
    t = F.col(text_col)
    ws = F.size(_tokens(text_col))
    # \p{L}\p{N} like _tokens above: Java \w is ASCII-only, so the
    # [^\w\s] form split EVERY accented/CJK character into its own
    # piece — 2-3x overcount on French/German, one piece per CJK char
    bpe_ish = F.size(
        F.filter(
            F.split(
                t,
                r"(?=\s)|(?<=\s)|(?=[^\p{L}\p{N}_\s])|(?<=[^\p{L}\p{N}_\s])",
            ),
            lambda x: F.length(F.trim(x)) > 0,
        )
    )
    return (
        docs.withColumn("ws_tokens", ws)
        .withColumn("subword_pieces", bpe_ish)
        .withColumn("approx_gpt_tokens", F.ceil(F.length(t) / 4))
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    whitespace/case-normalized text (content identity), plus a
    locality-sensitive prefix fingerprint of the first 256 chars."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.withColumn("fp64", F.xxhash64(norm)).withColumn(
        "fp_prefix", F.xxhash64(F.substring(norm, 1, 256))
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher/MassiveText-style intra-document repetition signals —
    the quality-filter family that catches boilerplate and scraped
    spam which token-level `quality_score` misses:

    - ``dup_line_frac``: fraction of line occurrences that are
      repeats of an earlier identical line
    - ``dup_line_char_frac``: fraction of characters sitting in
      repeated line occurrences
    - ``top2gram_frac``: fraction of token-bigram positions occupied
      by the document's most frequent bigram

    Shape at scale: explode → two-level aggregation, all map-side
    combinable; per-document state is bounded by the document itself
    (no cross-document joins, no window over the corpus).  The bigram
    generator is the codegen explode+slice shape (no HOF lambdas in
    the per-token path)."""
    lines = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), r"\n")).alias("ln"),
        )
        .filter(F.length(F.trim("ln")) > 0)
        .groupBy("id", "ln")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    line_stats = lines.groupBy("id").agg(
        (F.sum(F.col("c") - 1) / F.greatest(F.sum("c"), F.lit(1)))
        .alias("_dlf"),
        (
            F.sum((F.col("c") - 1) * F.length("ln"))
            / F.greatest(F.sum(F.col("c") * F.length("ln")), F.lit(1))
        ).alias("_dlcf"),
    )
    toks = docs.select(F.col(id_col).alias("id"), _tokens(text_col).alias("ws"))
    bigrams = (
        toks.filter(F.size("ws") >= 2)
        .select("id", F.explode(F.sequence(F.lit(1), F.size("ws") - 1)).alias("i"),
                "ws")
        .select("id", F.concat_ws(" ", F.slice("ws", F.col("i"), 2)).alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top_bg = bigrams.groupBy("id").agg(
        F.max("c").alias("_top_c"), F.sum("c").alias("_n_bg")
    )
    nudge = 1e-9  # exact-.5 round parity vs the DuckDB oracle
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(line_stats, "id", "left")
        .join(top_bg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round(F.coalesce(F.col("_dlf"), F.lit(0.0)) + nudge, 6)
            .alias("dup_line_frac"),
            F.round(F.coalesce(F.col("_dlcf"), F.lit(0.0)) + nudge, 6)
            .alias("dup_line_char_frac"),
            F.round(
                F.coalesce(F.col("_top_c") / F.col("_n_bg"), F.lit(0.0)) + nudge,
                6,
            ).alias("top2gram_frac"),
        )
    )


# PII patterns shared by the Spark path and the DuckDB oracle: plain
# character classes + bounded repetition + non-capturing groups only,
# valid and identical in Java regex and RE2 (no backrefs, lookaround).
# The phone tail binds separator+digits together ((?:[- ][0-9]{1,4})?)
# — the naive `[- ]?[0-9]{0,4}` form greedily swallowed the SPACE
# after a 3-3-4 number, gluing the placeholder to the next word.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}(?:[- ][0-9]{1,4})?",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, phone numbers, and IPv4 addresses, counting each
    kind — the privacy pass a training pipeline runs before packing.
    Adds ``n_<kind>`` counts and replaces matches in ``text`` with
    ``<KIND>`` placeholders.  Each kind is counted on the text AS IT
    STANDS when that kind's replacement runs (email, then phone, then
    ipv4), so ``n_<kind>`` equals the number of ``<KIND>``
    placeholders inserted — an auditor can reconcile counts against
    placeholders exactly (counting every kind on the original text
    would report a phone "redacted" that the earlier email pass had
    already consumed).  Pure codegen expressions; patterns are
    engine-portable (see PII_PATTERNS) so the DuckDB oracle reproduces
    the redaction bit-for-bit."""
    out = docs
    scrubbed = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{kind}", F.regexp_count(scrubbed, F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn("scrubbed_text", scrubbed)


def vocab_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    id_col: str | None = None,
) -> DataFrame:
    """Corpus vocabulary statistics — the tokenizer-training prestep:
    one row per distinct token with total occurrence count (``tf``)
    and document frequency (``df``), filtered to ``tf >= min_count``.

    Scale shape: one explode of the token arrays feeding TWO partial
    aggregations that share the exchange key (token): counts combine
    map-side, so the shuffle carries one row per distinct token per
    task, never one per occurrence — the same reason word-count
    scales.  No window, no join, no driver collection; top-k
    consumers sort the (small) distinct-token result, not the
    corpus."""
    doc_key = (
        F.col(id_col) if id_col
        else F.monotonically_increasing_id()  # df only needs distinctness
    )
    toks = docs.select(
        F.col(text_col), doc_key.alias("_d")
    ).select("_d", F.explode(_tokens(text_col)).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("_d").alias("df"),
        )
        .filter(F.col("tf") >= min_count)
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed
    tf-idf — the relevance prestep for corpus exploration and
    keyword-based dedup triage.

    weight(t, d) = tf(t,d) · (ln((1+N)/(1+df(t))) + 1)   (sklearn's
    smooth idf: never zero, no division hazards).  Plan shape: one
    explode → (doc, tok) tf aggregate → token-level df aggregate →
    tf⋈df equi-join on token → per-doc top-k window.  The df frame is
    |vocab| rows (bounded by the token alphabet, not the corpus), so
    at scale the join broadcasts; the window partitions by document —
    the same key the tf aggregate already hashed on.

    Determinism contract: ranking orders by the ROUNDED weight (6 dp,
    oracle nudge) with the token as tie-break — ranking on the raw
    double would let two near-equal weights swap order across engines
    at the last ulp, which a hash check cannot absorb."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(_tokens(text_col)).alias("tok"),
    )
    tf = toks.groupBy("_d", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    dfreq = (
        toks.groupBy("tok")
        .agg(F.count_distinct("_d").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            (
                F.log((1 + F.col("n")) / (1 + F.col("df"))) + 1.0
            ).alias("idf"),
        )
    )
    weighted = tf.join(dfreq, "tok").select(
        F.col("_d").alias(id_col),
        "tok",
        F.round(F.col("tf") * F.col("idf") + 1e-9, 6).alias("weight"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("weight").desc(), F.col("tok")
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "tok", "weight")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query —
    the retrieval scorer for eval-set mining and contamination triage
    (find the corpus documents most similar to a benchmark prompt).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len_d/avglen))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the standard
    non-negative variant).  Everything reduces before it joins: per-doc
    tf is only computed for the |query| terms (filter pushed below the
    tf aggregate), df/N/avglen are one |query|-row and two scalar
    aggregates broadcast to the scorer, and the final per-doc sum is
    ≤ |query| float terms (order drift ~1e-16, absorbed by the 6 dp
    rounding).  Documents matching no query term are dropped (score 0
    rows at corpus scale would be the entire corpus)."""
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(_tokens(text_col)).alias("tok"),
    )
    lens = toks.groupBy("_d").agg(F.count(F.lit(1)).alias("len_d"))
    scalars = lens.agg(
        F.sum("len_d").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    qtoks = toks.filter(F.col("tok").isin(terms))
    tf = qtoks.groupBy("_d", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        qtoks.groupBy("tok")
        .agg(F.count_distinct("_d").alias("df"))
        .crossJoin(F.broadcast(scalars))
        .select(
            "tok",
            F.log(
                1.0
                + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
            (F.col("tot") / F.col("n")).alias("avglen"),
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(lens, "_d")
        .select(
            "_d",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("len_d") / F.col("avglen"))
                )
            ).alias("part"),
        )
    )
    return (
        scored.groupBy("_d")
        .agg(F.round(F.sum("part") + 1e-9, 6).alias("score"))
        .select(F.col("_d").alias(id_col), "score")
    )


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram surprisal under the corpus's own
    unigram LM: avg over token occurrences of −ln(tf(t)/total) — the
    cheap perplexity proxy quality filters use (low = repetitive
    common-token text, high = rare-token/garbage text; both tails are
    triage candidates, complementing ``quality_score``'s shape
    heuristics).

    Determinism: the per-token surprisal is rounded ONCE at the
    vocabulary level to integer micro-nats (one ln per DISTINCT
    token), so the per-document aggregation is an exact int64 sum —
    a float sum over a few hundred occurrences would drift across
    engines right at the 6 dp grain.  The mean is then a single
    exact-int division.  Plan: token tf aggregate (|vocab| rows) →
    broadcast-sized join back to occurrences → per-doc sum with
    map-side partials."""
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.explode(_tokens(text_col)).alias("tok"),
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = tf.agg(F.sum("tf").alias("total"))
    lm = tf.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(
            -F.log(F.col("tf") / F.col("total")) * 1e6 + 1e-9, 0
        ).cast("long").alias("unats"),
    )
    return (
        toks.join(F.broadcast(lm), "tok")
        .groupBy(F.col("_d").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("unats") / F.count(F.lit(1)) / 1e6 + 1e-9, 6
            ).alias("mean_surprisal_nats"),
        )
    )
