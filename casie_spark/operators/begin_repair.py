"""Argument begin-repair stage (mode=model): snap predicted argument
span BEGINs onto the gold annotation convention.

The reference's BiLSTM-CRF span decoder learns the corpus' left-edge
convention (include the determiner of the NP: nug_arg_detection.py
trains on the gold BIO tags directly); the averaged-perceptron
substitute under-includes it, costing ~9 points of exact-begin recall
while the span itself is found (see train_begin.py for the measured
decomposition).  This stage recovers the edge with a trained 4-class
shift head over surface context on the EVENT/ARG-scale args frame:
feature ids are JVM crc32/shape expressions (no strings reach Python,
no Python hashing), one slim pandas_udf per span frame turns the int
ids into shifts, and all edits are JVM expressions.  No token-stream
work beyond two lag/lead windows that ride the existing doc_id
exchange.

Only mode=model pipelines run it; rules/gold modes keep byte parity
with the model-free reference semantics.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# token shifts applied to a span's begin, in model class order
SHIFTS = (-2, -1, 0, 1)
# token shifts applied to a span's END (r3 VERDICT next #5 — the
# symmetric right-edge head): -1 drops the last token, +1/+2 absorb
# following tokens.  Class order mirrors SHIFTS (outside-2, outside-1,
# keep, inside-1) so the same trainer fits both edges.
END_SHIFTS = (2, 1, 0, -1)

BEGIN_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "begin_weights.npz",
)

_BEGIN_CACHE: dict = {}

# context columns arguments_with_context() adds (consumed and dropped
# by repair_begins); _p1g/_p2g are the SAME-STREAM tags of the two
# preceding tokens — the overlap guard's inputs (r4 VERDICT next #6)
_CTX_COLS = ("_tok", "_p1", "_p1b", "_p2", "_p2b", "_nx", "_nxb",
             "_p1g", "_p2g")
# last-token context columns (consumed and dropped by repair_ends):
# the span's last token, the two following tokens (text + begin +
# same-stream tag) and the token before the last one (inside the span
# when n_tokens > 1)
_END_CTX_COLS = ("_ltok", "_ln1", "_ln1b", "_ln2", "_ln2b",
                 "_lp1", "_lp1b", "_lg1", "_lg2")
# assemble_spans carry_last mapping that produces them
_END_CARRY = {"_ltok": "token", "_ln1": "_nx", "_ln1b": "_nxb",
              "_ln2": "_n2", "_ln2b": "_n2b",
              "_lp1": "_p1", "_lp1b": "_p1b",
              "_lg1": "_ng1", "_lg2": "_ng2"}


# artifact key prefix -> weights-dict key; "aend"/"tend" are the
# right-edge heads (distinct prefixes so "arg_*" parsing stays exact)
_HEAD_KEYS = {"arg": "arg", "trig": "trig",
              "aend": "arg_end", "tend": "trig_end"}


# ---------------------------------------------------------------------
# JVM-native shift scoring (r5): the edge heads are linear summed-gather
# models over crc32-hashed surface ids — exactly the shape the linker's
# r4 JVM rewrite handled.  Feature ids become crc32 expressions
# (zlib.crc32 == java.util.zip.CRC32, bit-parity-probed incl. unicode),
# and ONE slim pandas_udf per span frame turns the int ids into the
# shifts (numpy gathers + argmax; no strings cross the Arrow boundary,
# no Python hashing).  Pure-JVM scoring was built and measured twice
# and lost both times — see _with_shifts_jvm's docstring for the
# receipts.  Differential parity vs the Python featurizer + float64
# _logits is gated in test_begin_repair.
# ---------------------------------------------------------------------

def _hid_col(prefix: str, *cols):
    """JVM twin of train_begin._h: token_id('\\x1f'.join(parts)) with
    None -> '' (begin_features' s() normalization)."""
    from .model_tagger import VOCAB_SIZE

    parts = [F.lit(prefix)] + [F.coalesce(c, F.lit("")) for c in cols]
    return F.lit(2) + F.pmod(
        F.crc32(F.encode(F.lower(F.concat_ws("\x1f", *parts)), "UTF-8")),
        F.lit(VOCAB_SIZE - 2))


def shape_id_col(c):
    """JVM twin of model_tagger.shape_id (10-class word shape);
    bit-parity-tested against the Python form in test_begin_repair."""
    tok = F.coalesce(c, F.lit(""))
    has_digit = tok.rlike(r"\p{Nd}")
    first = F.substring(tok, 1, 1)

    def cased(s):
        return F.lower(s) != F.upper(s)

    return (
        F.when(tok == "", 0)
        .when(tok.startswith("CVE-"), 9)
        .when(has_digit & tok.contains("."), 8)
        .when(tok.rlike(r"^\p{Nd}+$"), 7)
        .when(has_digit, 6)
        .when(tok.contains("$"), 5)
        .when((tok == F.upper(tok)) & cased(tok) & (F.length(tok) > 1), 4)
        .when((first == F.upper(first)) & cased(first), 3)
        .when((tok == F.lower(tok)) & cased(tok), 2)
        .when(~tok.rlike(r"[\p{L}\p{Nd}]"), 1)
        .otherwise(0)
    )


def _edge_id_cols(label_col: str, t0: str, p1: str, p2: str, nx: str
                  ) -> dict:
    """The ten hashed feature-id expressions of begin_features, as JVM
    columns (keyed like train_begin._KEYS)."""
    a, t = F.col(label_col), F.col(t0)
    p1c, p2c, nxc = F.col(p1), F.col(p2), F.col(nx)
    return {
        "at": _hid_col("a", a),
        "t0": _hid_col("t", t),
        "p1": _hid_col("1", p1c),
        "p2": _hid_col("2", p2c),
        "nx": _hid_col("n", nxc),
        "at_t0": _hid_col("A", a, t),
        "at_p1": _hid_col("B", a, p1c),
        "p1_t0": _hid_col("C", p1c, t),
        "at_p1_t0": _hid_col("D", a, p1c, t),
        "sh_p1": shape_id_col(p1c),
    }


def _with_shifts_jvm(df: DataFrame, begin_t: dict, end_t: dict | None,
                     label_col: str, begin_cols: tuple, end_cols: tuple,
                     b_shifts, e_shifts) -> DataFrame:
    """Append _shb (and _she when ``end_t``) = predicted edge shifts.

    Hybrid design, each alternative measured (r5): the 10 (or 20)
    hashed feature ids are JVM crc32/shape expressions — no strings
    ever reach Python and no Python hashing runs — and ONE slim
    pandas_udf per span frame turns the int ids into shifts (numpy
    table gathers + argmax over the broadcast weights, float64 in
    _KEYS order — bit-identical to train_begin._logits).  The two
    pure-JVM alternatives lose: one broadcast join per table costs
    ~20 AQE broadcast stages of scheduling latency (5.0 s vs this
    design's ~1 s standalone), and stack+single-join+sum-agg pays a
    span-scale join-back plus a 20x explode (5.2 s).  The id columns
    are int64 — the Arrow round-trip ships 20 ints per span instead
    of 9 strings, and the UDF body is pure gathers."""
    from pyspark.sql.functions import pandas_udf

    from .train_begin import _KEYS

    ids_b = _edge_id_cols(label_col, *begin_cols)
    id_exprs = [ids_b[k] for k in _KEYS]
    if end_t is not None:
        ids_e = _edge_id_cols(label_col, *end_cols)
        id_exprs += [ids_e[k] for k in _KEYS]

    bc = df.sparkSession.sparkContext.broadcast((begin_t, end_t))
    fused = end_t is not None

    @pandas_udf("int")
    def _shift_ids(*id_cols: pd.Series) -> pd.Series:
        bw, ew = bc.value
        n = len(id_cols[0])
        lb = bw["b"].astype(np.float64)[None, :].repeat(n, axis=0)
        for ki, k in enumerate(_KEYS):
            lb += bw[k][id_cols[ki].to_numpy()]
        b_sh = np.asarray(b_shifts, np.int32)[lb.argmax(axis=1)]
        if not fused:
            return pd.Series(b_sh)
        le = ew["b"].astype(np.float64)[None, :].repeat(n, axis=0)
        for ki, k in enumerate(_KEYS):
            le += ew[k][id_cols[10 + ki].to_numpy()]
        e_sh = np.asarray(e_shifts, np.int32)[le.argmax(axis=1)]
        # pack: (begin_shift + 2) * 8 + (end_shift + 1), both in-range
        return pd.Series((b_sh + 2) * 8 + (e_sh + 1))

    out = _shift_ids(*id_exprs)
    if not fused:
        return df.withColumn("_shb", out)
    return (
        df.withColumn("_pk", out)
        .withColumn("_shb", F.expr("_pk div 8") - 2)
        .withColumn("_she", F.expr("pmod(_pk, 8)") - 1)
        .drop("_pk")
    )


def load_begin_weights(path: str | None = None):
    """{"arg": tables, "trig": tables[, "arg_end": tables,
    "trig_end": tables]} from the trained edge-repair artifact
    (operators/train_begin.py trains one shift head per span kind and
    edge — argument spans keyed by arg_type, trigger spans by
    subtype), or None when absent.  Cached per (process, path); an
    absent artifact is not pinned."""
    from ..deploy import resolve_artifact

    p = resolve_artifact(path or BEGIN_ARTIFACT)
    if p in _BEGIN_CACHE:
        return _BEGIN_CACHE[p]
    if not os.path.exists(p):
        return None
    z = np.load(p, allow_pickle=False)
    out = {}
    for prefix, head in _HEAD_KEYS.items():
        tables = {k[len(prefix) + 1:]: z[k].astype(np.float32)
                  for k in z.files if k.startswith(prefix + "_")}
        if tables:
            out[head] = tables
    _BEGIN_CACHE[p] = out or None
    return _BEGIN_CACHE[p]


def with_begin_context(tagged: DataFrame,
                       tag_col: str | None = None) -> DataFrame:
    """Add sentence-scoped neighbor-token context columns to the token
    stream: previous/previous-2 token text + begin, next token text +
    begin.  The windows partition by doc_id and order by
    (sent_id, token_id) — the SAME partitioning every other tagging
    window uses, so no new Exchange enters the plan (the one-exchange
    gate in tests/test_plans.py covers the mode=model pipeline with
    this stage active).  Cross-sentence neighbors are nulled.

    ``tag_col`` additionally lags/leads the SAME-STREAM tag column
    (trigger_tag for trigger spans, arg_tag for argument spans) into
    _p1g/_p2g/_ng1/_ng2 — the overlap-guard inputs (a shift must not
    absorb a token already owned by a neighboring same-stream span)."""
    w = Window.partitionBy("doc_id").orderBy("sent_id", "token_id")
    same1 = F.lag("sent_id", 1).over(w) == F.col("sent_id")
    same2 = F.lag("sent_id", 2).over(w) == F.col("sent_id")
    samen = F.lead("sent_id", 1).over(w) == F.col("sent_id")
    samen2 = F.lead("sent_id", 2).over(w) == F.col("sent_id")
    out = (
        tagged
        .withColumn("_p1", F.when(same1, F.lag("token", 1).over(w)))
        .withColumn("_p1b", F.when(same1, F.lag("begin", 1).over(w)))
        .withColumn("_p2", F.when(same2, F.lag("token", 2).over(w)))
        .withColumn("_p2b", F.when(same2, F.lag("begin", 2).over(w)))
        .withColumn("_nx", F.when(samen, F.lead("token", 1).over(w)))
        .withColumn("_nxb", F.when(samen, F.lead("begin", 1).over(w)))
        .withColumn("_n2", F.when(samen2, F.lead("token", 2).over(w)))
        .withColumn("_n2b", F.when(samen2, F.lead("begin", 2).over(w)))
    )
    if tag_col is not None:
        out = (
            out
            .withColumn("_p1g", F.lag(tag_col, 1).over(w))
            .withColumn("_p2g", F.lag(tag_col, 2).over(w))
            .withColumn("_ng1", F.lead(tag_col, 1).over(w))
            .withColumn("_ng2", F.lead(tag_col, 2).over(w))
        )
    return out


def _ctx_carry(guard: bool) -> tuple[list[str], dict[str, str]]:
    """(carry columns, carry_last map) for the span assembly — the
    same-stream guard tags (_p1g/_p2g and the _lg1/_lg2 carry) only
    when ``guard`` is True: the overlap guard was measured WORSE on
    every config (artifacts/edge_audit.json), so the deployed path
    skips computing the four tag lag/leads entirely."""
    cols = [c for c in _CTX_COLS[1:] if guard or not c.endswith("g")]
    last = {k: v for k, v in _END_CARRY.items()
            if guard or not k.startswith("_lg")}
    return cols, last


def arguments_with_context(tagged: DataFrame,
                           carry: list[str] | None = None,
                           guard: bool = False) -> DataFrame:
    """extract_arguments over a context-augmented token stream; the
    span rows carry the first token's text (_tok) and its sentence
    neighbors (_p1/_p1b/_p2/_p2b/_nx/_nxb), plus the last token's
    context (_ltok/_ln1/_ln2/_lp1 + begins) for the end head.  Note
    _nx is the token AFTER the span's first token — i.e. the span's
    own second token when n_tokens > 1, which is exactly the +1-shift
    target; symmetrically _lp1 is the second-to-last token when
    n_tokens > 1, the end head's -1 target.  ``guard=True``
    additionally carries the same-stream tag context the overlap
    guard reads (the measured-rejected path — audit only)."""
    from .linking import extract_arguments

    cols, last = _ctx_carry(guard)
    ctx = with_begin_context(tagged,
                             tag_col="arg_tag" if guard else None) \
        .withColumn("_tok", F.col("token"))
    return extract_arguments(
        ctx, carry=list(carry or []) + ["_tok", *cols], carry_last=last)


def events_with_context(tagged: DataFrame,
                        carry: list[str] | None = None,
                        guard: bool = False) -> DataFrame:
    """extract_events variant of arguments_with_context — trigger
    spans carry the same neighbor-context columns for the trigger
    shift heads."""
    from .linking import extract_events

    cols, last = _ctx_carry(guard)
    ctx = with_begin_context(tagged,
                             tag_col="trigger_tag" if guard else None) \
        .withColumn("_tok", F.col("token"))
    return extract_events(
        ctx, carry=list(carry or []) + ["_tok", *cols], carry_last=last)


def repair_begins(args: DataFrame, weights,
                  label_col: str = "arg_type",
                  overlap_guard: bool = False) -> DataFrame:
    """Apply a trained shift head to a span frame produced by
    arguments_with_context() / events_with_context() (``label_col``:
    "arg_type" for argument spans, "subtype" for trigger spans).
    Adjusts begin / text / first_token_id / n_tokens; end is untouched
    (begin-only repair).  Predicted shifts whose target is unavailable
    (sentence edge, single-token span for +1) fall back to keep-as-is.
    Rebuilt text pads inter-token gaps with spaces — begins/ends stay
    exact (they come from the token stream), only non-space whitespace
    inside the gap is approximated.  Drops the context columns.

    Overlap behavior (r4 ADVICE, MEASURED r5): a left shift may absorb
    the I- tail of the PRECEDING predicted span, so two repaired spans
    can overlap.  The guard that suppresses those shifts
    (``overlap_guard=True``) was built and measured head-on
    (artifacts/edge_audit.json): it is slightly WORSE everywhere —
    exact-(begin,end) F1 nugget 0.789 -> 0.783, argument 0.796 ->
    0.785 — because the blocked shifts are mostly CORRECT repairs
    whose neighbor tag was itself a tagging error.  The unguarded
    default is therefore an evidence-backed choice, gated by
    tests/test_begin_repair.py::test_edge_audit_recorded_and_floored."""
    if weights is None:
        return args.drop(*_CTX_COLS)
    df = _with_shifts_jvm(args, weights, None, label_col,
                          ("_tok", "_p1", "_p2", "_nx"), (),
                          SHIFTS, None)
    df = df.withColumnRenamed("_shb", "_sh")
    return _apply_begin(df, overlap_guard=overlap_guard).drop(*_CTX_COLS)


def _free_pred(overlap_guard: bool):
    """Shared guard predicate for both edge appliers: a neighbor tag
    column is "free" (absorbable) when it is null or O; with the guard
    off every column is free."""
    def _free(col):
        if not overlap_guard:
            return F.lit(True)
        return F.col(col).isNull() | (F.col(col) == "O")
    return _free


def _apply_begin(df: DataFrame, shift_col: str = "_sh",
                 overlap_guard: bool = False) -> DataFrame:
    """JVM-side begin edits for a predicted shift column: guard
    unavailable targets to keep-as-is, then rewrite text / begin /
    first_token_id / n_tokens.  Shared by repair_begins and the fused
    repair_edges.

    ``overlap_guard`` (r4 VERDICT next #6): additionally suppress a
    LEFT shift whose absorbed token carries a non-O tag of the same
    stream (_p1g/_p2g from with_begin_context(tag_col=...)) — the
    absorbed token is the tail of the PRECEDING predicted span, so the
    unguarded shift would create overlapping spans."""
    sh = F.col(shift_col)
    _free = _free_pred(overlap_guard)

    # guard: fall back to 0 when the shift target does not exist
    df = df.withColumn(
        shift_col,
        F.when((sh == -1) & F.col("_p1b").isNotNull()
               & _free("_p1g"), -1)
        .when((sh == -2) & F.col("_p2b").isNotNull()
              & F.col("_p1b").isNotNull()
              & _free("_p1g") & _free("_p2g"), -2)
        .when((sh == 1) & F.col("_nxb").isNotNull()
              & (F.col("n_tokens") > 1), 1)
        .otherwise(0))

    pad1 = F.expr("repeat(' ', begin - _p1b - length(_p1))")
    pad2 = F.expr("repeat(' ', _p1b - _p2b - length(_p2))")
    new_text = (
        F.when(sh == -1, F.concat("_p1", pad1, "text"))
        .when(sh == -2,
              F.concat("_p2", pad2, "_p1", pad1, "text"))
        .when(sh == 1,
              F.expr("substring(text, _nxb - begin + 1)"))
        .otherwise(F.col("text")))
    new_begin = (
        F.when(sh == -1, F.col("_p1b"))
        .when(sh == -2, F.col("_p2b"))
        .when(sh == 1, F.col("_nxb"))
        .otherwise(F.col("begin")))
    return (
        df.withColumn("text", new_text)
        .withColumn("begin", new_begin)
        .withColumn("first_token_id", F.col("first_token_id") + sh)
        .withColumn("n_tokens", F.col("n_tokens") - sh)
        .drop(shift_col)
    )


def repair_ends(args: DataFrame, weights,
                label_col: str = "arg_type",
                overlap_guard: bool = False) -> DataFrame:
    """Right-edge twin of :func:`repair_begins` (r3 VERDICT next #5):
    a trained 4-class END_SHIFTS head snaps span ENDs onto the gold
    right-edge convention.  Consumes the last-token context columns
    (_ltok/_ln1/_ln2/_lp1 + begins) and adjusts end / text / n_tokens;
    begin and first_token_id are untouched.  Runs AFTER repair_begins
    (n_tokens guards see the begin-adjusted count).  The feature
    contract is the mirrored begin featurizer: t0=last token,
    p1=adjacent-outside (_ln1), p2=outside-2 (_ln2),
    nx=adjacent-inside (_lp1) — so train_begin's trainer fits both
    edges unchanged."""
    if weights is None:
        return args.drop(*_END_CTX_COLS)
    df = _with_shifts_jvm(args, weights, None, label_col,
                          ("_ltok", "_ln1", "_ln2", "_lp1"), (),
                          END_SHIFTS, None)
    df = df.withColumnRenamed("_shb", "_sh")
    return _apply_end(df, overlap_guard=overlap_guard).drop(*_END_CTX_COLS)


def _apply_end(df: DataFrame, shift_col: str = "_sh",
               overlap_guard: bool = False) -> DataFrame:
    """JVM-side end edits for a predicted end-shift column (guard +
    rewrite text / end / n_tokens).  Reads `begin` and `n_tokens`
    from the frame, so when composed after :func:`_apply_begin` the
    guards and substring arithmetic see the begin-adjusted values —
    exactly the sequential repair_begins |> repair_ends semantics.
    ``overlap_guard``: suppress a RIGHT extension whose absorbed token
    (_lg1/_lg2) is owned by the FOLLOWING same-stream span."""
    sh = F.col(shift_col)
    _free = _free_pred(overlap_guard)

    # guard: keep-as-is when the shift target does not exist
    df = df.withColumn(
        shift_col,
        F.when((sh == 1) & F.col("_ln1b").isNotNull()
               & _free("_lg1"), 1)
        .when((sh == 2) & F.col("_ln1b").isNotNull()
              & F.col("_ln2b").isNotNull()
              & _free("_lg1") & _free("_lg2"), 2)
        .when((sh == -1) & F.col("_lp1b").isNotNull()
              & (F.col("n_tokens") > 1), -1)
        .otherwise(0))

    n1_end = F.col("_ln1b") + F.length("_ln1")
    n2_end = F.col("_ln2b") + F.length("_ln2")
    lp1_end = F.col("_lp1b") + F.length("_lp1")
    pad1 = F.expr("repeat(' ', _ln1b - end)")
    pad2 = F.expr("repeat(' ', _ln2b - (_ln1b + length(_ln1)))")
    new_text = (
        F.when(sh == 1, F.concat("text", pad1, "_ln1"))
        .when(sh == 2,
              F.concat("text", pad1, "_ln1", pad2, "_ln2"))
        .when(sh == -1,
              F.expr("substring(text, 1, _lp1b + length(_lp1) - begin)"))
        .otherwise(F.col("text")))
    new_end = (
        F.when(sh == 1, n1_end)
        .when(sh == 2, n2_end)
        .when(sh == -1, lp1_end)
        .otherwise(F.col("end")))
    return (
        df.withColumn("text", new_text)
        .withColumn("end", new_end)
        .withColumn("n_tokens", F.col("n_tokens") + sh)
        .drop(shift_col)
    )


def repair_edges(args: DataFrame, begin_w, end_w,
                 label_col: str = "arg_type",
                 overlap_guard: bool = False) -> DataFrame:
    """Fused begin+end repair: both edge heads are scored on one frame
    — the end head's features (last-token context columns) are
    untouched by the begin edit, so both shifts can be predicted
    before either edit applies; only the *guards* are order-sensitive
    and those are applied sequentially (_apply_begin then _apply_end),
    reproducing repair_begins |> repair_ends bit-for-bit.

    r5: feature hashing is JVM-side (_with_shifts_jvm — crc32/shape
    id expressions), and one slim int-only pandas_udf per span frame
    does the table gathers + argmax: no strings cross the Arrow
    boundary and no Python hashing runs.  Bit-identical to the Python
    scorer (test_begin_repair differential gate; the full-corpus edge
    audit regenerates artifacts/edge_audit.json byte-for-byte)."""
    if begin_w is None and end_w is None:
        return args.drop(*_CTX_COLS, *_END_CTX_COLS)
    if end_w is None:
        return repair_begins(args, begin_w, label_col,
                             overlap_guard=overlap_guard).drop(*_END_CTX_COLS)
    if begin_w is None:
        return repair_ends(args.drop(*_CTX_COLS), end_w, label_col,
                           overlap_guard=overlap_guard)
    df = _with_shifts_jvm(args, begin_w, end_w, label_col,
                          ("_tok", "_p1", "_p2", "_nx"),
                          ("_ltok", "_ln1", "_ln2", "_lp1"),
                          SHIFTS, END_SHIFTS)
    df = _apply_begin(df, "_shb", overlap_guard=overlap_guard) \
        .drop(*_CTX_COLS)
    return _apply_end(df, "_she", overlap_guard=overlap_guard) \
        .drop(*_END_CTX_COLS)
