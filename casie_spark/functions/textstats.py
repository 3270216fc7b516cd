"""Text-analysis column functions for the training-data pipeline layer:
language-ID heuristic, quality scoring, token counting, fingerprint
hashing.  New capability beyond the reference (CASIE has no corpus-QA
stage); designed for 100 TB corpora: every function here is a pure
Catalyst column expression (JVM-side, whole-stage codegen, no Python),
so it rides predicate pushdown / column pruning for free.

Cross-engine invariant: ``hash16`` is the first 16 bits of md5 of the
UTF-8 bytes, identical in Spark (``conv(substring(md5(x),1,4),16,10)``)
and DuckDB (``('0x' || substring(md5(x),1,4))::int``) — every
dedup/fingerprint oracle relies on this agreement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --- tokenization ----------------------------------------------------------

WORD_SPLIT_RE = r"\s+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single other symbols
# (the shape GPT-2-style byte-BPE pre-splits on, minus unicode classes)
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def split_words(text: Column) -> Column:
    return F.split(text, WORD_SPLIT_RE)


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(split_words(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Regex pre-tokenizer token count (BPE-upper-bound estimate)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


# --- hashing ---------------------------------------------------------------

def hash16(col: Column) -> Column:
    """Deterministic 16-bit hash shared bit-for-bit with the DuckDB
    oracle (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int")


def hash16_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash16` for oracle SQL strings."""
    return f"('0x' || substring(md5({expr}), 1, 4))::int"


# --- language identification ----------------------------------------------

# tiny per-language stopword profiles; the heuristic is
# score(lang) = #tokens in profile, argmax with fixed tie-break order.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "les", "et", "une", "est", "dans", "pour"),
    "es": ("el", "los", "y", "que", "una", "por", "con"),
}
LANG_ORDER = ("en", "de", "fr", "es")  # tie-break precedence


def lang_scores(words: Column) -> dict[str, Column]:
    """words: array<string> -> {lang: hit-count column}."""
    return {
        lang: F.aggregate(
            words, F.lit(0),
            lambda acc, w: acc + F.when(w.isin(*prof), 1).otherwise(0),
        )
        for lang, prof in LANG_PROFILES.items()
    }


def predict_lang(words: Column) -> Column:
    """Argmax language with LANG_ORDER tie-break; 'und' (undetermined)
    when no profile word occurs."""
    scores = lang_scores(words)
    best = F.greatest(*[scores[lg] for lg in LANG_ORDER])
    pred = F.lit("und")
    for lg in reversed(LANG_ORDER):
        pred = F.when((best > 0) & (scores[lg] == best), F.lit(lg)).otherwise(pred)
    return pred


# --- quality scoring -------------------------------------------------------

QUALITY_STOPWORDS = ("the", "a", "of", "to", "and")


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-document quality features: token count, mean word
    length, stopword ratio, alpha ratio, and a composite [0,1] score
    (Gopher/C4-style length+stopword gates, rebuilt as column math)."""
    words = split_words(F.col(text_col))
    n_tokens = F.size(words)
    n_stop = F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + F.when(w.isin(*QUALITY_STOPWORDS), 1).otherwise(0),
    )
    n_chars = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    out = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("mean_word_len",
                    F.round((n_chars - n_tokens + 1) / n_tokens, 4))
        .withColumn("stopword_ratio", F.round(n_stop / n_tokens, 4))
        .withColumn("alpha_ratio", F.round(n_alpha / n_chars, 4))
    )
    score = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .when(F.col("stopword_ratio") <= 0.0, 0.2)
        .otherwise(
            F.least(
                F.lit(1.0),
                F.col("alpha_ratio") * 0.5
                + F.least(F.col("stopword_ratio") * 4, F.lit(0.5)),
            )
        )
    )
    return out.withColumn("quality_score", F.round(score, 4))


def repetition_columns(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition gates (Rae et al. 2021 §A1.1): the
    fraction of a document's word bigrams/trigrams that are duplicates
    of an earlier occurrence, plus the most-frequent-word share.
    Templated/boilerplate pages spike on these; a 100 TB pipeline
    filters on them before training.

    Shape: one posexplode + one groupBy(doc) with countDistinct — the
    per-doc aggregation is map-side combinable and keys on doc_id
    (uniform), no skew.  Returns (id_col, dup_bigram_frac,
    dup_trigram_frac, top_word_frac)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    words = df.select(
        id_col,
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    grams = (
        words.withColumn("w1", F.lead("w", 1).over(w))
        .withColumn("w2", F.lead("w", 2).over(w))
        .withColumn("_bi", F.when(F.col("w1").isNotNull(),
                                  F.concat_ws(" ", "w", "w1")))
        .withColumn("_tri", F.when(F.col("w2").isNotNull(),
                                   F.concat_ws(" ", "w", "w1", "w2")))
    )
    agg = grams.groupBy(id_col).agg(
        F.count("w").alias("_n"),
        F.countDistinct("w").alias("_nw"),
        F.count("_bi").alias("_nb"),
        F.countDistinct("_bi").alias("_ndb"),
        F.count("_tri").alias("_nt"),
        F.countDistinct("_tri").alias("_ndt"),
    )
    top = (
        words.groupBy(id_col, "w").agg(F.count("*").alias("_c"))
        .groupBy(id_col).agg(F.max("_c").alias("_topc"))
    )
    return (
        agg.join(top, id_col)
        .select(
            id_col,
            F.round((F.col("_nb") - F.col("_ndb"))
                    / F.greatest(F.col("_nb"), F.lit(1)), 4)
            .alias("dup_bigram_frac"),
            F.round((F.col("_nt") - F.col("_ndt"))
                    / F.greatest(F.col("_nt"), F.lit(1)), 4)
            .alias("dup_trigram_frac"),
            F.round(F.col("_topc") / F.col("_n"), 4).alias("top_word_frac"),
        )
    )


# --- fingerprinting --------------------------------------------------------

def shingle_fingerprints(words_df: DataFrame, mod: int = 16,
                         doc_col: str = "doc_id", word_col: str = "w",
                         pos_col: str = "pos") -> DataFrame:
    """Mod-p sampled rolling fingerprints (MOSS/winnowing family):
    3-word shingles -> hash16 -> keep hashes ≡ 0 (mod p).  The sample is
    content-defined, so shared text yields shared fingerprints
    regardless of position — the property plagiarism/near-dup mining
    needs.  Returns (doc_id, fp) distinct."""
    from pyspark.sql import Window

    w = Window.partitionBy(doc_col).orderBy(pos_col)
    sh = (
        words_df.withColumn("_w1", F.lead(word_col, 1).over(w))
        .withColumn("_w2", F.lead(word_col, 2).over(w))
        .filter(F.col("_w2").isNotNull())
        .select(
            doc_col,
            hash16(F.concat_ws(" ", word_col, "_w1", "_w2")).alias("fp"),
        )
    )
    return sh.filter(F.col("fp") % mod == 0).distinct()


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", alpha: float = 0.5) -> DataFrame:
    """Corpus-level unigram LM quality proxy (the unigram,
    oracle-checkable form of the CCNet/Wenzek et al. 2020 KenLM
    perplexity filter): add-alpha-smoothed token frequencies over the
    WHOLE corpus, then per-document mean log10 probability.  Documents
    far from the corpus distribution (gibberish, boilerplate-free
    junk, wrong-language residue) score low; the complement of the
    per-doc heuristics in quality_columns, which see one row at a
    time and no corpus statistics.

    Scale shape: per-(doc, word) counts first — one token-scale
    exchange with map-side combine absorbing the Zipf head — then the
    vocabulary aggregates from the counts frame (doc-word scale, not
    token scale); the 1-row totals frame broadcast-crossjoins into the
    per-word score, and the score joins back at doc-word scale with
    the strategy left to Catalyst/AQE (broadcast when the vocabulary
    fits, shuffle on the word key when it does not — crawl-scale
    vocabularies are too big to force).  Returns
    (doc_id, n_tokens, mean_logp10), one row per non-empty document;
    mean_logp10 rounded to 4 (the repo's cross-engine float rule)."""
    words = docs.select(
        id_col,
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE),
                     lambda x: x != F.lit(""))
        ).alias("w"),
    )
    dw = words.groupBy(id_col, "w").agg(F.count("*").alias("c"))
    vocab = dw.groupBy("w").agg(F.sum("c").alias("cw"))
    totals = vocab.agg(F.sum("cw").alias("n_total"),
                       F.count("*").alias("v"))
    scored = vocab.crossJoin(F.broadcast(totals)).select(
        "w",
        F.log10((F.col("cw") + alpha)
                / (F.col("n_total") + alpha * (F.col("v") + 1)))
        .alias("logp"),
    )
    return dw.join(scored, "w").groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.round(F.sum(F.col("c") * F.col("logp")) / F.sum("c"), 4)
        .alias("mean_logp10"),
    )


# --- C4 line-level cleaning -------------------------------------------------

def c4_clean_lines(docs: DataFrame, text_col: str = "text",
                   sep: str = "\n", min_words: int = 5,
                   min_lines: int = 3) -> DataFrame:
    """C4's line-level cleaning rules (Raffel et al. 2020 §2.2 — the
    step that turned Common Crawl into C4; the repeated-span dedup
    half of that section is :func:`casie_spark.operators.dedup.
    drop_duplicate_lines`).  A line is KEPT iff it ends in a terminal
    punctuation mark (``. ! ? "``), has at least ``min_words``
    whitespace-delimited words, and does not mention ``javascript``
    (case-insensitive).  The whole page is DROPPED iff fewer than
    ``min_lines`` lines survive, or the original page contains the
    placeholder phrase ``lorem ipsum`` (lowercased check) or a curly
    brace ``{`` (code/template leakage).  Returns the input frame with
    ``text_col`` rebuilt from the surviving lines plus
    ``n_lines_kept``; non-text columns pass through.

    Scale shape: MAP-ONLY — split, a filter lambda per line, and an
    array_join, all inside one whole-stage-codegen span; zero
    exchanges at any corpus size (plan-gated in test_plans.py).  The
    per-line word count re-splits the line inside the lambda, which
    stays JVM-side (higher-order functions, no UDF)."""
    def _line_ok(ln: Column) -> Column:
        n_words = F.size(F.filter(F.split(ln, r"\s+"),
                                  lambda x: x != F.lit("")))
        return (F.rtrim(ln).rlike('[.!?"]$')
                & (n_words >= min_words)
                & ~F.lower(ln).contains("javascript"))

    kept = F.filter(F.split(F.col(text_col), sep, -1), _line_ok)
    return (docs.withColumn("_kept", kept)
            .withColumn("n_lines_kept", F.size("_kept"))
            .filter((F.col("n_lines_kept") >= min_lines)
                    & ~F.lower(F.col(text_col)).contains("lorem ipsum")
                    & ~F.col(text_col).contains("{"))
            .withColumn(text_col, F.array_join("_kept", sep))
            .drop("_kept"))


# --- cardinality sketching --------------------------------------------------

def kmv_cardinality(docs: DataFrame, group_col: str = "source",
                    text_col: str = "text", k: int = 64,
                    ngram: int = 1) -> DataFrame:
    """KMV (k-minimum-values) distinct-token cardinality sketch per
    group (Bar-Yossef et al. 2002; the bottom-k theta-sketch family):
    hash every distinct token uniformly into [0, 1), keep the k
    smallest per group, estimate |distinct| = (k-1) / h_k.  Groups
    with fewer than k distinct tokens report their exact count.

    Returns (group, n_distinct_exact, kmv_estimate) — the exact
    column is computed alongside so the estimator's error is
    self-auditing (and both columns are deterministic, so the whole
    frame is DuckDB-oracle-checkable — q58 — unlike an HLL register
    set, whose binary encoding is engine-specific).

    The hash is the md5 convention every cross-engine operator here
    shares: the first 8 hex digits as a uniform 32-bit fraction.

    Scale shape: ONE (group, term)-keyed distinct (Zipf head combines
    map-side), then a vocabulary-scale per-group window for the k-th
    smallest.  At 100 TB the window sorts each group's vocabulary —
    ~10^8 rows per language bucket, shuffle-partitioned by group; for
    a fleet of ad-hoc cardinalities where even that is too much, the
    register form (``F.approx_count_distinct``, HLL++ — map-combinable
    register-max, no vocabulary materialized) is the production knob;
    tests/test_textstats gates KMV and HLL against the exact count on
    the same frame so the swap is evidence-backed.
    """
    toks = F.filter(split_words(F.lower(F.col(text_col))),
                    lambda x: x != F.lit(""))
    if ngram > 1:
        # space-joined n-grams straight off the token array — no
        # window, no extra exchange; the sketched item just widens
        items = F.transform(
            F.sequence(F.lit(0), F.size(toks) - ngram),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1)
                       for j in range(ngram)]))
        docs = docs.filter(F.size(toks) >= ngram)
    else:
        items = toks
    terms = (docs.select(F.col(group_col).alias("grp"),
                         F.explode(items).alias("term"))
             .distinct())
    h = (F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("double")
         / F.lit(float(1 << 32)))
    w = Window.partitionBy("grp").orderBy("h", "term")
    ranked = (terms.withColumn("h", h)
              .withColumn("rk", F.row_number().over(w)))
    agg = (ranked.groupBy("grp").agg(
        F.count("*").alias("n_distinct_exact"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("_hk")))
    est = F.when(F.col("_hk").isNotNull(),
                 F.round((k - 1) / F.col("_hk"), 2)) \
           .otherwise(F.col("n_distinct_exact").cast("double"))
    return agg.select(F.col("grp").alias(group_col),
                      "n_distinct_exact", est.alias("kmv_estimate"))
