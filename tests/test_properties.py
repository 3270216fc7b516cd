"""Property-based tests (hypothesis) over the pure kernels that the
distributed operators delegate to: tokenizer offsets, time
normalization, number words, dependency-tree walks.

These cover the input space the golden tests cannot enumerate; the
Spark stages are thin wrappers over these functions (plus window/join
plumbing tested elsewhere), so invariants proven here transfer."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from casie_spark.functions.timeparse import (
    adjust,
    day_difference,
    durationtotime,
    resolve_time,
    txt2int,
)
from casie_spark.operators.tokenizer import tokenize_text
from casie_spark.operators.trees import (
    build_deptree,
    depth_to_root,
    span_head,
    synth_deps,
    tree_path,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=400,
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_tokenizer_offsets_are_exact_slices(text):
    toks = tokenize_text(text)
    prev_begin = -1
    for sent_id, token_id, tok, begin, end in toks:
        assert text[begin:end] == tok          # offset fidelity invariant
        assert begin < end
        assert begin > prev_begin              # strictly increasing globally
        prev_begin = begin
    # determinism
    assert toks == tokenize_text(text)


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_tokenizer_ids_dense(text):
    toks = tokenize_text(text)
    by_sent = {}
    for sent_id, token_id, *_ in toks:
        by_sent.setdefault(sent_id, []).append(token_id)
    for sent_id, ids in by_sent.items():
        assert ids == list(range(len(ids)))    # dense, ordered token ids
    assert sorted(by_sent) == list(range(len(by_sent)))


WORDS = st.lists(
    st.one_of(
        st.sampled_from(["one", "two", "hundred", "thousand", "million",
                         "and", "years", "ago", "last", "week", "January",
                         "2018", "21st", "Tuesday", "noise", "today"]),
        st.text(st.characters(min_codepoint=48, max_codepoint=122), max_size=8),
    ),
    max_size=8,
)


@given(WORDS)
@settings(max_examples=300, deadline=None)
def test_time_functions_total(tokens):
    """Time normalization is a total function: any token list yields a
    3-field date with sane ranges, and adjust is idempotent on its own
    output when fields are complete."""
    pub = (2018, 11, 9)
    d = resolve_time(tokens, pub)
    assert len(d) == 3
    y, m, day = d
    # upper bounds are hard invariants (year window < 2020, months <= 12,
    # day ordinal <= 31 pre-adjust); lower bounds are open: "N years/
    # weeks ago" subtracts unboundedly, faithfully to the reference
    assert y <= 2100
    assert m <= 12
    assert day <= 40
    dur, is_text = durationtotime(tokens, pub)
    assert isinstance(is_text, bool)
    if 0 not in d:
        assert adjust(list(d), pub)[0] == d[0]


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_txt2int_total_nonnegative(s):
    assert txt2int(s) >= 0


@given(st.lists(st.sampled_from(
    ["one", "two", "three", "twenty", "hundred", "thousand", "and"]),
    min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_txt2int_reference_recurrence(words):
    """Oracle: independent evaluation of the reference recurrence
    (current*scale+inc, flush on scale>100)."""
    vocab = {"one": (1, 1), "two": (1, 2), "three": (1, 3),
             "twenty": (1, 20), "hundred": (100, 0),
             "thousand": (1000, 0), "and": (1, 0)}
    cur = res = 0
    for w in words:
        sc, inc = vocab[w]
        cur = cur * sc + inc
        if sc > 100:
            res, cur = res + cur, 0
    assert txt2int(" ".join(words)) == res + cur


@given(st.lists(st.text(st.characters(min_codepoint=97, max_codepoint=122),
                        min_size=1, max_size=8), min_size=1, max_size=25))
@settings(max_examples=150, deadline=None)
def test_synth_deps_tree_invariants(tokens):
    """synth_deps always yields a rooted tree: every token appears as a
    dependent exactly once, every node reaches the root, paths exist
    between any two nodes, and the span head lies in the span."""
    edges = synth_deps(tokens)
    deps = sorted(d for _, d, _ in edges)
    assert deps == list(range(1, len(tokens) + 1))
    tree = build_deptree(edges)
    n = len(tokens)
    for i in range(1, n + 1):
        assert 0 <= depth_to_root(tree, i) <= 25
    if n >= 2:
        p = tree_path(tree, 1, n)
        assert p and p[0] == 1 and p[-1] == n
        assert len(set(p)) == len(p)           # simple path
        span = list(range(1, min(n, 4) + 1))
        assert span_head(tree, span) in span


@given(st.integers(1900, 2100), st.integers(1, 12), st.integers(1, 28),
       st.integers(1900, 2100), st.integers(1, 12), st.integers(1, 28))
@settings(max_examples=200, deadline=None)
def test_day_difference_metric_properties(y1, m1, d1, y2, m2, d2):
    a, b = [y1, m1, d1], [y2, m2, d2]
    assert day_difference(a, a) == 0
    assert day_difference(a, b) == -day_difference(b, a)


@given(st.text(max_size=24))
@settings(max_examples=300, deadline=None)
def test_singular_noun_total(w):
    """F12 is a total function: any string yields False or a non-empty
    string, and singular output is never longer than the input
    (suffix-stripping rules; irregulars map within the table)."""
    from casie_spark.functions.singular import singular_noun

    out = singular_noun(w)
    assert out is False or (isinstance(out, str) and len(out) >= 1)
    if isinstance(out, str) and w.lower() not in (
            "people", "men", "women", "mice", "geese", "teeth", "feet",
            "media", "data", "indices", "matrices", "vertices",
            "appendices", "criteria", "phenomena"):
        assert len(out) <= len(w)


_TOKEN_ST = st.one_of(
    st.none(),
    st.text(max_size=8),
    st.sampled_from(["the", "The", "THE", "CVE-2021-1234", "$4",
                     "patch-2.3.1", "stole", ""]),
)


@given(st.lists(_TOKEN_ST, min_size=1, max_size=40))
@settings(max_examples=150, deadline=None)
def test_feature_arrays_unique_scatter_parity(toks):
    """The unique-scatter featurizer (r5 decode optimization) is
    bit-identical to the per-token naive form for every key — the
    inference weights were trained against these exact ids."""
    import pandas as pd

    from casie_spark.operators.model_tagger import (
        BIGRAM_SIZE, PAD_ID, TRIGRAM_SIZE, _ngram_id, feature_arrays,
        shape_id, token_id)
    from casie_spark.operators.tagging import _py_stem

    prevs = [None] + toks[:-1]
    nexts = toks[1:] + [None]
    f = feature_arrays(toks, prevs, nexts, cng=False, wc=False)

    def norm(t):
        return "" if t is None or (
            isinstance(t, float) and pd.isna(t)) else str(t).lower()

    low = [norm(t) for t in toks]
    plo = [norm(t) for t in prevs]
    nlo = [norm(t) for t in nexts]
    ref = {
        "t0": [token_id(t) for t in low],
        "s0": [token_id(_py_stem(t)) for t in low],
        "tm1": [PAD_ID if not t else token_id(t) for t in plo],
        "tp1": [PAD_ID if not t else token_id(t) for t in nlo],
        "sh": [shape_id(str(t)) for t in toks],
        "b1": [_ngram_id(p + "|" + c, BIGRAM_SIZE)
               for p, c in zip(plo, low)],
        "b2": [_ngram_id(c + "|" + x, BIGRAM_SIZE)
               for c, x in zip(low, nlo)],
        "tri": [_ngram_id(p + "|" + c + "|" + x, TRIGRAM_SIZE)
                for p, c, x in zip(plo, low, nlo)],
        "pf3": [PAD_ID if not t else token_id("\x02" + t[:3])
                for t in low],
        "sf3": [PAD_ID if not t else token_id("\x03" + t[-3:])
                for t in low],
        "sf4": [PAD_ID if not t else token_id("\x04" + t[-4:])
                for t in low],
    }
    for k, v in ref.items():
        assert list(f[k]) == v, k


# ---------------------------------------------------------------------------
# char_ngram_bag (the hashed subword kernel behind the "cng" feature)
# ---------------------------------------------------------------------------

def test_char_ngram_bag_golden():
    """Pinned ids for representative tokens — the committed rejection
    receipts (BASELINE.md hash-capacity table) were measured against
    exactly these hashes, so any drift invalidates them."""
    import numpy as np

    from casie_spark.operators.model_tagger import CNG_MAX, char_ngram_bag

    assert char_ngram_bag("").tolist() == [0] * CNG_MAX
    a = char_ngram_bag("a")          # "<a>" has exactly one 3-gram
    assert a[0] == 244359 and (a[1:] == 0).all()
    flaw = char_ngram_bag("flaw")
    nz = flaw[flaw > 0]
    assert len(nz) == 10
    assert nz[:4].tolist() == [25122, 44660, 146521, 158978]
    long = char_ngram_bag("pseudopseudohypoparathyroidism-attack-vector")
    assert (long > 0).sum() == CNG_MAX          # truncated, fully packed
    assert long[0] == 632 and long[-1] == 54740  # smallest-id subsample
    assert isinstance(flaw, np.ndarray) and flaw.dtype == np.int64


@given(st.text(max_size=24))
@settings(max_examples=200, deadline=None)
def test_char_ngram_bag_invariants(tok):
    from casie_spark.operators.model_tagger import (
        CNG_MAX, CNG_SIZE, char_ngram_bag)

    bag = char_ngram_bag(tok)
    assert bag.shape == (CNG_MAX,)
    nz = bag[bag > 0]
    # PAD(0) only as a trailing block; live ids never collide with the
    # PAD/OOV rows (>= 2), stay in-table, strictly increase (dedup +
    # smallest-kept subsample is order-canonical)
    assert (bag[len(nz):] == 0).all()
    assert all(2 <= i < CNG_SIZE for i in nz.tolist())
    assert (nz[1:] > nz[:-1]).all() if len(nz) > 1 else True
    if tok:
        assert len(nz) >= 1        # "<t>" always yields a 3-gram
    # deterministic (train/serve share one function)
    assert (char_ngram_bag(tok) == bag).all()


@given(st.lists(st.text(max_size=10), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_char_ngram_bags_unique_scatter_parity(low):
    """The unique-scatter batch form is row-identical to the per-token
    kernel — same contract the other featurizers prove above."""
    import numpy as np

    from casie_spark.operators.model_tagger import (
        _char_ngram_bags, char_ngram_bag)

    got = _char_ngram_bags(low)
    want = np.stack([char_ngram_bag(t) for t in low])
    assert (got == want).all()
