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
