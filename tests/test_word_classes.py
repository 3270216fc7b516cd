"""Induced word classes (r3 VERDICT next #1 — the public-knowledge
substitute for the reference's absent Domain-Word2vec inputs,
nug_arg_detection.py:129 / link_coref.py:288): artifact
well-formedness, id conventions, determinism of the k-means kernel,
and the distributional sanity the tagger transfer relies on."""

from __future__ import annotations

import numpy as np

from casie_spark.operators.word_classes import (
    ARTIFACT,
    ID_OFFSET,
    OOV_ID,
    PAD_ID,
    WordClasses,
    kmeans,
    load_word_classes,
)


def test_artifact_present_and_well_formed():
    wc = load_word_classes(ARTIFACT)
    assert wc is not None, "committed word_classes.npz missing"
    V = len(wc.vocab)
    assert V >= 5000
    assert wc.vecs.shape == (V, 64)
    # unit rows
    nrm = np.linalg.norm(wc.vecs, axis=1)
    assert np.allclose(nrm, 1.0, atol=1e-3)
    assert wc.cls_fine.shape == (V,) and wc.cls_coarse.shape == (V,)
    assert wc.n_fine <= 512 and wc.n_coarse <= 64
    # every class id in range, vocabulary sorted + unique
    assert wc.cls_fine.min() >= 0 and wc.cls_coarse.min() >= 0
    assert wc.vocab == sorted(set(wc.vocab))


def test_class_id_conventions():
    wc = load_word_classes(ARTIFACT)
    w = wc.vocab[10]
    ids = wc.class_ids([None, "", "zzzz-not-a-word-9q", w], coarse=True)
    assert ids[0] == PAD_ID and ids[1] == PAD_ID
    assert ids[2] == OOV_ID
    assert ids[3] == int(wc.cls_coarse[10]) + ID_OFFSET
    # stem fallback: an inflected form of a vocab word maps to a row
    assert wc.row("stole") >= 0
    assert wc.cosine("zzzz-not-a-word-9q", w) is None
    c = wc.cosine(w, w)
    assert c is not None and abs(c - 1.0) < 1e-3


def test_security_neighbors_sane():
    """The artifact must encode domain structure, not noise: a known
    security term's nearest neighbor (excluding itself) is another
    security term with high cosine — the property the trigger-head
    class tables transfer through."""
    wc = load_word_classes(ARTIFACT)
    i = wc.row("vulnerability")
    assert i >= 0
    sims = wc.vecs @ wc.vecs[i]
    near = [wc.vocab[j] for j in np.argsort(-sims)[1:6]]
    security = {"flaw", "flaws", "bug", "bugs", "vulnerabilities",
                "exploit", "vuln", "weakness", "zero-day", "hole",
                "issue", "glitch"}
    assert security & set(near), near


def test_kmeans_deterministic_and_covering():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 8))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    a = kmeans(X, 16, seed=3)
    b = kmeans(X, 16, seed=3)
    assert (a == b).all()
    assert a.min() >= 0 and a.max() < 16


def test_in_memory_construction_matches_loader(tmp_path):
    vocab = ["alpha", "beta", "gamma"]
    vecs = np.eye(3, 4, dtype=np.float32)
    wc = WordClasses(vocab=vocab, vecs=vecs,
                     cls_fine=np.array([0, 1, 1], np.int32),
                     cls_coarse=np.array([0, 0, 1], np.int32))
    assert wc.n_fine == 2 and wc.n_coarse == 2
    p = str(tmp_path / "wc.npz")
    np.savez(p, vocab=np.array(vocab), vecs=vecs,
             cls_fine=wc.cls_fine, cls_coarse=wc.cls_coarse)
    loaded = load_word_classes(p)
    assert loaded.vocab == vocab
    assert (loaded.cls_fine == wc.cls_fine).all()
