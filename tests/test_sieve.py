"""Sieve-chain kernel tests (operators/sieve.py — the CoreNLP-chain
substitute feeding the trained coref combiner's `chain` feature).

Pure-Python kernel => golden cases + hypothesis properties, per the
repo test policy (CLAUDE.md); the Spark side is exercised through
test_coref_parity (the chain feature rides the existing coref UDF).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from casie_spark.operators.sieve import (
    FIELD_SEP,
    MENT_SEP,
    doc_chain_sets,
    head_token,
    normalize,
    parse_mentions,
    sieve_chains,
    strip_det,
)


def chains_of(mentions):
    ch = sieve_chains(mentions)
    groups = {}
    for m, c in zip(mentions, ch):
        groups.setdefault(c, set()).add(m[2])
    return list(groups.values())


def same_chain(mentions, a, b):
    ch = sieve_chains(mentions)
    ia = next(i for i, m in enumerate(mentions) if m[2] == a)
    ib = next(i for i, m in enumerate(mentions) if m[2] == b)
    return ch[ia] == ch[ib]


DOC = [
    (0, 10, "Microsoft", "Organization"),
    (0, 50, "the company", "Organization"),
    (1, 5, "Microsoft Corp", "Organization"),
    (1, 30, "it", "Organization"),
    (2, 7, "hackers", "Person"),
    (2, 40, "they", "Person"),
    (3, 20, "Federal Bureau of Investigation", "Organization"),
    (4, 9, "FBI", "Organization"),
    (5, 1, "CVE-2021-1234", "CVE"),
    (6, 3, "sensitive data", "Data"),
    (7, 8, "the data", "Data"),
]


def test_exact_and_containment():
    # containment (same type): Microsoft ~ Microsoft Corp
    assert same_chain(DOC, "Microsoft", "Microsoft Corp")


def test_pronoun_attaches_to_nearest_compatible():
    # "it" (non-person) -> nearest preceding Organization mention
    assert same_chain(DOC, "it", "Microsoft Corp")
    # transitively to the first mention
    assert same_chain(DOC, "it", "Microsoft")
    # plural pronoun -> same-type antecedent
    assert same_chain(DOC, "they", "hackers")


def test_acronym():
    assert same_chain(DOC, "FBI", "Federal Bureau of Investigation")


def test_head_match_same_type():
    assert same_chain(DOC, "sensitive data", "the data")


def test_head_match_requires_same_type():
    ms = [
        (0, 0, "the Windows flaw", "Vulnerability"),
        (1, 0, "a design flaw", "Vulnerability"),
        (2, 0, "security flaw", "Software"),  # type clash: no merge
    ]
    assert same_chain(ms, "the Windows flaw", "a design flaw")
    assert not same_chain(ms, "the Windows flaw", "security flaw")


def test_person_pronoun_skips_organizations():
    ms = [
        (0, 0, "Adobe", "Organization"),
        (0, 5, "John Smith", "Person"),
        (1, 0, "Cisco", "Organization"),
        (1, 5, "he", "Person"),
    ]
    assert same_chain(ms, "he", "John Smith")
    assert not same_chain(ms, "he", "Cisco")


def test_pronoun_window_bound():
    ms = [
        (0, 0, "Equifax", "Organization"),
        (9, 0, "it", "Organization"),  # 9 sentences later: no link
    ]
    assert not same_chain(ms, "it", "Equifax")


def test_unrelated_types_stay_apart():
    ms = [
        (0, 0, "CVE-2021-1234", "CVE"),
        (1, 0, "WannaCry", "Malware"),
        (2, 0, "$4,000", "Money"),
    ]
    assert len(chains_of(ms)) == 3


def test_normalize_and_helpers():
    assert normalize("  The  Company's ") == "the company"
    assert strip_det("the company") == "company"
    assert strip_det("company") == "company"
    assert head_token("adobe flash player") == "player"
    assert head_token("") == ""


def test_doc_chain_sets_alignment():
    packed = [
        MENT_SEP.join([
            FIELD_SEP.join(("0", "10", "Microsoft", "Organization")),
            FIELD_SEP.join(("0", "30", "users", "Person")),
        ]),
        "",  # event with no arguments
        FIELD_SEP.join(("1", "5", "Microsoft Corp", "Organization")),
    ]
    sets = doc_chain_sets(packed)
    assert [len(s) for s in sets] == [2, 0, 1]
    # Microsoft (event 0, mention 0) chains with Microsoft Corp (event 2)
    assert sets[0][0] == sets[2][0]
    assert sets[0][1] != sets[0][0]


def test_parse_mentions_skips_malformed():
    ok = FIELD_SEP.join(("1", "2", "x y", "Data"))
    bad = FIELD_SEP.join(("a", "2", "x", "Data"))
    short = "justtext"
    ments = parse_mentions(MENT_SEP.join([ok, bad, short]))
    assert ments == [(1, 2, "x y", "Data")]


_mention = st.tuples(
    st.integers(0, 20), st.integers(0, 500),
    st.text(st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                          whitelist_characters=" -."), max_size=24),
    st.sampled_from(["Organization", "Person", "Data", "CVE", "Malware"]),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_mention, max_size=25))
def test_sieve_total_and_stable(ms):
    """One chain id per mention; ids are valid indices; permuting the
    input permutes the output identically (order independence)."""
    ch = sieve_chains(ms)
    assert len(ch) == len(ms)
    assert all(0 <= c < len(ms) for c in ch)
    perm = list(reversed(ms))
    chp = sieve_chains(perm)
    # same partition under the reversal
    def key(mentions, chains):
        groups = {}
        for m, c in zip(mentions, chains):
            groups.setdefault(c, []).append(m)
        return sorted(tuple(sorted(g)) for g in groups.values())
    assert key(ms, ch) == key(perm, chp)


@settings(max_examples=100, deadline=None)
@given(st.lists(_mention, max_size=20))
def test_exact_duplicates_always_chain(ms):
    """Two identical non-pronoun mentions always share a chain."""
    ch = sieve_chains(ms + ms)
    n = len(ms)
    for i, m in enumerate(ms):
        surf = normalize(m[2])
        from casie_spark.operators.sieve import PRONOUNS

        if len(strip_det(surf)) >= 2 and strip_det(surf) not in PRONOUNS \
                and surf not in PRONOUNS:
            assert ch[i] == ch[n + i], (m, ch[i], ch[n + i])
