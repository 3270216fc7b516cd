"""Event coreference clustering (operators.coref)."""

from __future__ import annotations

import numpy as np

from casie_spark.operators.coref import (
    average_linkage_clusters,
    cluster_events,
)


def test_average_linkage_basic():
    # two tight pairs far apart
    d = np.array([
        [0.0, 0.1, 0.9, 0.9],
        [0.1, 0.0, 0.9, 0.9],
        [0.9, 0.9, 0.0, 0.2],
        [0.9, 0.9, 0.2, 0.0],
    ])
    labels = average_linkage_clusters(d, threshold=0.5)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_average_linkage_threshold_blocks_merge():
    d = np.array([[0.0, 0.8], [0.8, 0.0]])
    assert average_linkage_clusters(d, 0.5) == [0, 1]
    assert average_linkage_clusters(d, 0.9) == [0, 0]


def test_merge_sequence_prefix_matches_deployed_clustering():
    """train_coref's threshold grid relies on the dendrogram-prefix
    property: labels at threshold t == average_linkage_clusters(d, t)
    (which stops at the FIRST merge above t).  Property-checked over
    random symmetric distance matrices, including inversion-prone
    ones."""
    from casie_spark.operators.train_coref import _prefix_k, merge_sequence

    rng = np.random.RandomState(7)
    for _ in range(40):
        n = rng.randint(2, 10)
        d = rng.rand(n, n)
        d = (d + d.T) / 2.0
        np.fill_diagonal(d, 0.0)
        merge_dists, states = merge_sequence(d)
        for thr in (0.05, 0.25, 0.5, 0.75, 0.95):
            expect = np.asarray(average_linkage_clusters(d, thr))
            got = states[_prefix_k(merge_dists, thr)]
            assert (expect == got).all(), (n, thr)


def test_fit_logistic_recovers_signal():
    from casie_spark.operators.train_coref import fit_logistic, rank_auc

    rng = np.random.RandomState(0)
    X = rng.randn(2000, 9)
    y = (X[:, 0] - 0.7 * X[:, 3] + 0.3 * rng.randn(2000) > 0).astype(float)
    w, b, mu, sd = fit_logistic(X, y)
    assert w[0] > 1.0 and w[3] < -0.5
    z = ((X - mu) / sd) @ w + b
    assert rank_auc(z, y) > 0.95
    # deterministic: same data -> bit-identical fit
    w2, b2, *_ = fit_logistic(X, y)
    assert (w2 == w).all() and b2 == b


def test_b_cubed_trainer_golden():
    """pred {a,b},{c}; gold {a,b,c} -> P = 1, R = 5/9 (same worked
    example as the Spark scorer's golden test)."""
    from casie_spark.operators.train_coref import _b_cubed

    p, r, f1 = _b_cubed([("d", "x", 5), ("d", "x", 5), ("d", "y", 5)])
    assert p == 1.0
    assert abs(r - 5 / 9) < 1e-12


def test_coref_artifact_loads():
    from casie_spark.operators.coref import (
        COREF_PAIR_FEATURES,
        load_coref_weights,
    )

    tw = load_coref_weights()
    assert tw is not None, "committed coref artifact missing"
    w, b, mu, sd, thr = tw
    assert w.shape == (len(COREF_PAIR_FEATURES),)
    assert 0.0 < thr < 1.0


def test_cluster_events_spark(spark):
    events = spark.createDataFrame(
        [
            ("d1", 0, "Databreach", 0, "breached", "Actual"),
            ("d1", 1, "Databreach", 1, "breach", "Actual"),       # same surface family
            ("d1", 2, "Databreach", 9, "sold illegally", "Generic"),
            ("d1", 3, "Phishing", 2, "phishing", "Actual"),       # other subtype
        ],
        "doc_id string, event_id long, subtype string, sent_id int, "
        "text string, realis string",
    )
    linked = spark.createDataFrame(
        [
            ("d1", 0, "Data"), ("d1", 1, "Data"), ("d1", 2, "Money"),
            ("d1", 3, "Person"),
        ],
        "doc_id string, event_id long, arg_type string",
    )
    out = {r["event_id"]: r["cluster_id"]
           for r in cluster_events(events, linked).collect()}
    assert len(out) == 4
    # same-subtype near-identical events cluster together...
    assert out[0] == out[1]
    # ...the distant generic one and the other subtype do not
    assert out[2] != out[0]
    assert out[3] != out[0]
