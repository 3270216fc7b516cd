"""Token tagging stages -> BIO ``trigger_tag`` / ``arg_tag`` columns.

Two providers behind the same column contract
(doc_id, sent_id, token_id, token, begin, end -> + trigger_tag, arg_tag
[, role, realis]):

1. ``tag_rules`` — deterministic rule/gazetteer tagger: the model-free
   v1 of the reference's BiLSTM-CRF stages (SURVEY.md section 2.10 —
   model weights are absent upstream, .MISSING_LARGE_BLOBS), built from
   the reference's own rule machinery:
   - trigger seed lexicons Wordset (link_coref.py:43-47; reference
     matches by w2v similarity >= 0.68, here exact lexicon match on a
     light stem),
   - general-noun triggers resolved by the per-doc trigger-type
     histogram scoreH (generalnountrigger link_coref.py:898-920,
     :941-945),
   - CVE / version regexes (parseJsontoFeatures.py:223-228, :185-222),
   - money/time/number shapes, vendor/product gazetteers
     (parseJsontoFeatures.py:879-884 gazetteer membership).

2. ``tag_gold_replay`` — BIO tags derived from gold annotation spans by
   an offset-range join; used by the parity tests (the pipeline from
   tags onward must reconstruct the gold triples).

Everything is JVM-side: literal ``isin`` sets, broadcast joins, window
functions.  No Python UDF in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config
from ..functions.regex import is_cve_token, is_version_token

# ---------------------------------------------------------------------------
# rule tagger vocabulary (JVM literal sets)
# ---------------------------------------------------------------------------

_MONTHS = ["january", "february", "march", "april", "may", "june", "july",
           "august", "september", "october", "november", "december"]
_TIME_WORDS = _MONTHS + ["monday", "tuesday", "wednesday", "thursday",
                         "friday", "saturday", "sunday", "yesterday",
                         "today", "tomorrow", "week", "month", "year",
                         "tuesday"]
_VENDOR_GAZ = ["adobe", "microsoft", "cisco", "oracle", "siemens", "apple",
               "google", "mozilla", "intel", "samsung", "facebook",
               "twitter", "amazon", "ibm", "equifax", "yahoo"]
_SYSTEM_GAZ = ["windows", "flash", "chrome", "firefox", "safari", "ios",
               "android", "linux", "weblogic", "simatic", "firmware",
               "server", "servers", "database", "databases", "website",
               "websites", "network", "networks", "system", "systems"]
_DATA_GAZ = ["records", "credentials", "passwords", "emails", "data",
             "information", "files", "documents", "details"]
_PII_GAZ = ["addresses", "ssn", "names", "birthdates", "phone"]
_MALWARE_GAZ = ["ransomware", "malware", "trojan", "botnet", "wannacry",
                "spyware", "keylogger", "virus"]
_PERSON_GAZ = ["hackers", "hacker", "attackers", "attacker", "researchers",
               "researcher", "criminals", "users", "victims", "customers",
               "employees", "patients"]


def _py_stem(w: str) -> str:
    """Python twin of _stem for building the lexicon lookup."""
    if len(w) > 6 and w.endswith("ing"):
        return w[:-3]
    if len(w) > 5 and w.endswith("ed"):
        return w[:-2]
    if len(w) > 4 and w.endswith("s") and not w.endswith("ss"):
        return w[:-1]
    return w


def _ner_arg():
    """Map entity-typed ``ner`` tags to argument classes — the
    low-precedence recall fallback.  Only the entity families the
    gazetteers can miss (look-back inherited nouns): Organization /
    Person / System-Software-Device; shape classes (CVE, Money, …)
    stay with their dedicated higher-precedence rules."""
    t = F.substring(F.col("ner"), 3, 1000)
    return (
        F.when(t == "Organization", "Organization")
        .when(t == "Person", "Person")
        .when(t.isin("System", "Software", "Device"), "System")
        .otherwise(F.lit(None))
    )


def _stem(col):
    """Light suffix stem so lexicon matches inflections the reference
    reaches via word2vec similarity (link_coref.py:254-283).
    endswith/length/substr only — the regex form cost 3 regex matches
    on every token of the stream."""
    c = F.lower(col)
    n = F.length(c)
    return (
        F.when(c.endswith("ing") & (n > 6), c.substr(F.lit(1), n - 3))
        .when(c.endswith("ed") & (n > 5), c.substr(F.lit(1), n - 2))
        .when(c.endswith("s") & ~c.endswith("ss") & (n > 4),
              c.substr(F.lit(1), n - 1))
        .otherwise(c)
    )


def with_dominant_trigger(df: DataFrame, trig_col: str) -> DataFrame:
    """+ ``_dominant``: the doc's most frequent trigger type (scoreH
    histogram, link_coref.py:941-945), ties broken lexicographically.

    Window formulation over the existing doc_id partitioning — count
    per (doc, type) partition, argmax per doc via a packed bigint key
    (count*8 + inverted lexicographic rank).  The groupBy +
    broadcast-join-back alternative re-executes the upstream subtree
    (no common-subplan reuse) and broadcasts one row per document —
    O(n_docs) driver/executor memory, a scale-killer at 1e9 docs.
    ``trig_col`` must be null for non-trigger tokens.
    """
    lex_sorted = sorted(config.EVENT_SUBTYPES)
    assert len(lex_sorted) <= 8, "packed key allots 3 bits for the rank"
    trig = F.col(trig_col)
    lexrank = F.lit(None).cast("int")
    for i, et in enumerate(lex_sorted):
        lexrank = F.when(trig == et, F.lit(i)).otherwise(lexrank)
    cnt = F.count(trig_col).over(Window.partitionBy("doc_id", trig_col))
    key = F.when(trig.isNotNull(), cnt * 8 + (7 - lexrank))
    best_key = F.max(key).over(Window.partitionBy("doc_id"))
    best_rank = F.lit(7) - (best_key % 8)
    dominant = F.lit(None).cast("string")
    for i, et in enumerate(lex_sorted):
        dominant = F.when(best_rank == i, F.lit(et)).otherwise(dominant)
    return df.withColumn("_dominant", dominant)


def tag_rules(tokens: DataFrame) -> DataFrame:
    """tokens -> + trigger_tag, arg_tag (BIO, single-token spans).

    Trigger precedence mirrors combine() (link_coref.py:1196-1219):
    lexicon match (dtrigger analog) > general-noun-by-histogram
    (gtrigger analog applies only when nothing else fired).

    A derived ``ner`` column (whitelist/BIO encoding + J8 look-back
    propagation, operators/ner.py) is computed when absent; entity
    types the argument gazetteers missed — above all look-back
    inherited Organization/Person/System on common nouns — become
    low-precedence argument candidates, the recall role NER features
    play in the reference's models (parseJsontoFeatures.py:232-256).
    """
    if "ner" not in tokens.columns:
        from .ner import with_ner

        tokens = with_ner(tokens)
    low = F.lower(F.col("token"))
    stem = _stem(F.col("token"))

    # 1. lexicon trigger: token (exact or stemmed) in Wordset[etype],
    #    first matching etype in EVENT_SUBTYPES order.  The lexicon is
    #    a ~400-row broadcast lookup, NOT a when()-chain — the chain
    #    blew the 64 KB codegen method limit inside the histogram agg.
    spark = tokens.sparkSession
    rows = []
    for prio, etype in enumerate(config.EVENT_SUBTYPES):
        words = set(config.WORDSET[etype])
        stems = {_py_stem(w) for w in words}
        for t in sorted(words):
            rows.append((t, etype, prio, True))   # exact-form term
        for t in sorted((words | stems)):
            rows.append((t, etype, prio, False))  # stem-form term
    base_prio = len(config.EVENT_SUBTYPES)
    for etype, nouns in config.GENERAL_NOUNS.items():
        if etype == "general":
            continue
        for t in nouns:
            rows.append((t, etype, base_prio, True))
            rows.append((t, etype, base_prio, False))
    lex = spark.createDataFrame(
        rows, "term string, etype string, prio int, exact boolean"
    )
    wbest = Window.partitionBy("term", "exact").orderBy("prio", "etype")
    lex = (
        lex.withColumn("_r", F.row_number().over(wbest)).filter("_r=1").drop("_r")
    )
    lex_exact = lex.filter("exact").select(
        F.col("term").alias("_x_term"), F.col("etype").alias("_x_et"),
        F.col("prio").alias("_x_p"),
    )
    lex_stem = lex.filter("NOT exact").select(
        F.col("term").alias("_s_term"), F.col("etype").alias("_s_et"),
        F.col("prio").alias("_s_p"),
    )

    df = (
        tokens.withColumn("_low", low)
        .withColumn("_stem", stem)
        .join(F.broadcast(lex_exact), F.col("_low") == F.col("_x_term"), "left")
        .join(F.broadcast(lex_stem), F.col("_stem") == F.col("_s_term"), "left")
        .withColumn(
            "_trig",
            F.when(
                F.col("_x_p").isNotNull()
                & (F.col("_s_p").isNull() | (F.col("_x_p") <= F.col("_s_p"))),
                F.col("_x_et"),
            ).otherwise(F.col("_s_et")),
        )
        .drop("_x_term", "_x_et", "_x_p", "_s_term", "_s_et", "_s_p")
    )

    # 2. 'general' nouns take the doc's dominant trigger type
    #    (scoreH histogram, link_coref.py:941-945, applied :898-920).
    #    Window formulation — count per (doc, type) partition, argmax
    #    per doc via a packed key (count desc, lexicographic type asc)
    #    — instead of groupBy + broadcast-join-back: the join form
    #    re-executes the whole upstream subtree for the histogram
    #    branch (Spark has no common-subplan reuse) and adds a
    #    shuffle; the window rides the existing doc_id partitioning.
    df = df.withColumn(
        "_is_general", low.isin(config.GENERAL_NOUNS["general"])
    )
    df = with_dominant_trigger(df, "_trig")
    df = df.withColumn(
        "trigger_tag",
        F.when(F.col("_trig").isNotNull(), F.concat(F.lit("B-"), F.col("_trig")))
        .when(F.col("_is_general") & F.col("_dominant").isNotNull(),
              F.concat(F.lit("B-"), F.col("_dominant")))
        .otherwise(F.lit("O")),
    )

    # 3. argument tags (entity shapes + gazetteers). Precedence: CVE >
    #    Version > Money > Number > Time > Malware > PII > Data >
    #    Organization > System > Person > GeneralArg.
    #    Window partitions by doc_id only (sentence handled via guard
    #    columns) so the upstream doc_id partitioning is reused.
    w = Window.partitionBy("doc_id").orderBy("sent_id", "token_id")
    same_sent = F.lag("sent_id", 1, -1).over(w) == F.col("sent_id")
    prev = F.when(same_sent, F.lag(low, 1, "").over(w)).otherwise(F.lit(""))
    # cheap scalar gates ahead of every regex (see ner.raw_ner note):
    # the typical all-letters token must evaluate zero regexes
    tokc = F.col("token")
    has_digit = tokc != F.translate(tokc, "0123456789", "")
    is_money = (tokc.startswith("$") & tokc.rlike(r"^\$\d")) | (
        low.isin("million", "billion", "thousand")
        & same_sent
        & F.lag(tokc, 1, "").over(w).rlike(r"^\$?\d")
    )
    is_number = (has_digit & tokc.rlike(r"^\d[\d,]*$")
                 & ~prev.isin("cve", "v"))
    is_year = has_digit & tokc.rlike(r"^(19|20)\d\d$")

    arg = (
        F.when(tokc.startswith("CVE-") & is_cve_token(tokc), "CVE")
        .when(has_digit & is_version_token(tokc)
              & ~tokc.rlike(r"^\d+$"), "Version")
        .when(is_money, "Money")
        .when(low.isin(_TIME_WORDS) | is_year, "Time")
        .when(low.isin(_MALWARE_GAZ), "Malware")
        .when(low.isin(_PII_GAZ), "PII")
        .when(low.isin(_DATA_GAZ), "Data")
        .when(low.isin(_VENDOR_GAZ), "Organization")
        .when(low.isin(_SYSTEM_GAZ), "System")
        .when(low.isin(_PERSON_GAZ), "Person")
        .when(_ner_arg().isNotNull(), _ner_arg())
        .when(is_number, "Number")
        .when(low.isin(config.GENERAL_ARG["Vulnerability"]), "Vulnerability")
        .when(low.isin(config.GENERAL_ARG["Patch"]), "Patch")
        .otherwise(F.lit(None))
    )
    df = df.withColumn("_arg", arg)

    # token predicted both trigger and argument -> argument wins
    # (readPredicted, link_coref.py:613-614)
    df = df.withColumn(
        "trigger_tag",
        F.when(F.col("_arg").isNotNull(), F.lit("O")).otherwise(F.col("trigger_tag")),
    )

    # B/I: consecutive same-argument-type tokens continue the span
    prev_arg = F.when(same_sent, F.lag("_arg", 1).over(w))
    df = df.withColumn(
        "arg_tag",
        F.when(F.col("_arg").isNull(), F.lit("O"))
        .when(prev_arg.eqNullSafe(F.col("_arg")), F.concat(F.lit("I-"), F.col("_arg")))
        .otherwise(F.concat(F.lit("B-"), F.col("_arg"))),
    )
    return df.drop("_trig", "_is_general", "_dominant", "_arg", "_low", "_stem")


# ---------------------------------------------------------------------------
# gold replay
# ---------------------------------------------------------------------------

def tag_gold_replay(tokens: DataFrame, gold_events: DataFrame,
                    gold_arguments: DataFrame) -> DataFrame:
    """Derive BIO tags from gold spans by offset containment.

    A token belongs to a span when token.begin >= span.begin and
    token.begin < span.end (the reference aligns label files to tokens
    by characterOffsetBegin, prepare.py:310-311).  B- on the first
    token of the span, I- after.  Both gold sides are tiny per doc ->
    broadcast joins.
    """
    nug = gold_events.select(
        F.col("doc_id").alias("_g_doc"),
        F.col("subtype").alias("_g_label"),
        F.col("nugget_begin").alias("_g_begin"),
        F.col("nugget_end").alias("_g_end"),
        F.col("realis").alias("_g_realis"),
    )
    toks = tokens.join(
        F.broadcast(nug),
        (F.col("doc_id") == F.col("_g_doc"))
        & (F.col("begin") >= F.col("_g_begin"))
        & (F.col("begin") < F.col("_g_end")),
        "left",
    ).drop("_g_doc")
    # a token may fall in overlapping gold nuggets (rare): keep the one
    # with the largest begin (innermost), deterministically
    wtok = Window.partitionBy("doc_id", "sent_id", "token_id").orderBy(
        F.desc("_g_begin"), "_g_end", "_g_label", "_g_realis"
    )
    toks = (
        toks.withColumn("_rk", F.row_number().over(wtok))
        .filter("_rk = 1")
        .drop("_rk")
    )
    toks = toks.withColumn(
        "trigger_tag",
        F.when(F.col("_g_label").isNull(), "O")
        .when(F.col("begin") == F.col("_g_begin"), F.concat(F.lit("B-"), F.col("_g_label")))
        .otherwise(F.concat(F.lit("I-"), F.col("_g_label"))),
    ).withColumn("realis", F.col("_g_realis")).drop("_g_label", "_g_begin", "_g_end", "_g_realis")

    arg = gold_arguments.select(
        F.col("doc_id").alias("_a_doc"),
        F.col("arg_type").alias("_a_label"),
        F.col("role").alias("_a_role"),
        F.col("begin").alias("_a_begin"),
        F.col("end").alias("_a_end"),
    )
    # same span annotated in several events (coref): deterministic pick
    warg = Window.partitionBy("_a_doc", "_a_begin", "_a_end").orderBy(
        "_a_label", "_a_role"
    )
    arg = (
        arg.withColumn("_dup", F.row_number().over(warg))
        .filter("_dup = 1")
        .drop("_dup")
    )
    toks = toks.join(
        F.broadcast(arg),
        (F.col("doc_id") == F.col("_a_doc"))
        & (F.col("begin") >= F.col("_a_begin"))
        & (F.col("begin") < F.col("_a_end")),
        "left",
    ).drop("_a_doc")
    toks = (
        toks.withColumn("_rk", F.row_number().over(
            Window.partitionBy("doc_id", "sent_id", "token_id").orderBy(
                F.desc("_a_begin"), "_a_end", "_a_label", "_a_role")))
        .filter("_rk = 1")
        .drop("_rk")
    )
    toks = toks.withColumn(
        "arg_tag",
        F.when(F.col("_a_label").isNull(), "O")
        .when(F.col("begin") == F.col("_a_begin"), F.concat(F.lit("B-"), F.col("_a_label")))
        .otherwise(F.concat(F.lit("I-"), F.col("_a_label"))),
    ).withColumn("role", F.col("_a_role")).drop("_a_label", "_a_begin", "_a_end", "_a_role")

    # argument wins over trigger on the same token (link_coref.py:613-614)
    return toks.withColumn(
        "trigger_tag",
        F.when(F.col("arg_tag") != "O", "O").otherwise(F.col("trigger_tag")),
    )
