"""Role assignment (roleassign, reference code/link_coref.py:1409-1457).

Semantics:
- The upstream role column (model prediction / gold replay) wins when
  present.  NOTE a deliberate divergence: the reference *forces* the
  single-valued RolePair role over the model output (:1420-1427), but
  its RolePair constants use a different surface vocabulary than the
  corpus roles the models were trained on (e.g. RolePair says
  'Ransom-Price'/'Vulnerable-System-Version' where the corpus says
  'Price'/'Vulnerable_System_Version') — forcing would systematically
  rename ~600 corpus-vocabulary roles, so upstream-first preserves
  parity with the corpus the models emit.
- With no upstream role: the single-valued RolePair role (:1420-1427),
  else the first legal role as deterministic fallback (model-free v1 —
  a trained model slots in behind the same column).
- Databreach 'Number' arguments take Number-of-Victim /
  Number-of-Compromised-Data from the role of the *next* argument id
  attached to the same event (:1444-1457).

Physical note: the (subtype, arg_type) -> role lookup is a ~70-row
broadcast-joined table, NOT a nested when()-chain — the chain version
blew the 64 KB whole-stage-codegen method limit and forced interpreted
fallback for the whole stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import config


def role_lookup_df(spark: SparkSession) -> DataFrame:
    """(subtype, arg_type, single_role, first_role) — RolePair flattened."""
    rows = []
    for sub, amap in config.ROLE_PAIR.items():
        for atype, roles in amap.items():
            rows.append(
                (sub, atype, roles[0] if len(roles) == 1 else None, roles[0])
            )
    return spark.createDataFrame(
        rows, "subtype string, arg_type string, single_role string, first_role string"
    )


# keyed by path (ADVICE r2: a single-slot cache pinned the first result)
_ROLE_WEIGHTS: dict[str, tuple] = {}


def load_role_weights(path: str | None = None):
    """(tables, labels) from the trained role-phrase artifact
    (operators/train_roles.py), or None when absent.  Cached per
    (process, path); the provider broadcasts it."""
    import os

    import numpy as np

    from ..deploy import resolve_artifact
    from .train_roles import ROLE_ARTIFACT

    p = resolve_artifact(path or ROLE_ARTIFACT)
    if p in _ROLE_WEIGHTS:
        return _ROLE_WEIGHTS[p]
    if not os.path.exists(p):
        return None
    z = np.load(p, allow_pickle=False)
    tables = {k[5:]: z[k].astype(np.float32)
              for k in z.files if k.startswith("role_") and k != "role_labels"}
    labels = [str(s) for s in z["role_labels"]]
    _ROLE_WEIGHTS[p] = (tables, labels)
    return _ROLE_WEIGHTS[p]


def trained_role_provider(weights=None):
    """Role-phrase model provider for :func:`assign_roles` — the
    trained replacement for the reference's BiLSTM-attention role model
    (role_phrase.py; SURVEY §2.10 M5).  Broadcast summed-gather linear
    head over (subtype, arg_type) pair + hashed head/first words of the
    argument surface; corpus accuracy 0.972 overall / 0.940 on the
    AmbiguousList subset vs 0.327 for the deterministic fallback."""
    def provider(cand: DataFrame) -> DataFrame:
        w = weights if weights is not None else load_role_weights()
        if w is None:  # pragma: no cover - artifact is committed
            return cand.select(
                "doc_id", "event_id", "arg_id",
                F.lit(None).cast("string").alias("role"))
        bc = cand.sparkSession.sparkContext.broadcast(w)

        @pandas_udf("string")
        def predict(sub: pd.Series, at: pd.Series,
                    txt: pd.Series) -> pd.Series:
            from .train_roles import _logits, role_features

            tables, labels = bc.value
            f = role_features(sub.tolist(), at.tolist(), txt.tolist())
            out = np.array(labels, dtype=object)[_logits(tables, f).argmax(1)]
            return pd.Series(out)

        return cand.select(
            "doc_id", "event_id", "arg_id",
            predict("subtype", "arg_type", "arg_text").alias("role"))

    return provider


def is_ambiguous_role(subtype, arg_type):
    """P4 candidate predicate (AmbiguousList, prepare.py:177-179):
    True when the (event subtype, argument entity type) pair has more
    than one plausible role and the reference routes it to the
    role-phrase model instead of the deterministic RolePair table."""
    c = F.lit(False)
    for sub, types in config.AMBIGUOUS_LIST.items():
        c = c | ((subtype == sub) & arg_type.isin(types))
    return c


def ambiguous_role_candidates(linked: DataFrame) -> DataFrame:
    """The role-model candidate set: linked pairs passing the P4
    filter.  This is the exact input selection of the reference's
    role-phrase stage (role_phrase.py:35 ArgumentList3 narrows the
    label files the same way)."""
    return linked.filter(
        is_ambiguous_role(F.col("subtype"), F.col("arg_type")))


def assign_roles(linked: DataFrame, provider=None,
                 route: str = "ambiguous", canon: bool = False) -> DataFrame:
    """linked (from operators.linking.link) -> + final ``role``.

    ``provider``: optional role-phrase model hook — a callable taking
    a candidate subset and returning (doc_id, event_id, arg_id, role)
    predictions.  With ``route="ambiguous"`` (the reference semantics)
    only the P4 AmbiguousList pairs reach the provider and resolve as
    upstream > provider > deterministic.  With ``route="all"`` (the
    mode=model quality path) EVERY linked pair is scored by the
    provider — the trained head is more accurate than the
    deterministic table on every slice (0.972 overall vs 0.616,
    train_roles.py), emits the gold-corpus vocabulary, and covers the
    (subtype, Software) pairs RolePair has no entry for at all (845
    gold arguments that otherwise fall through to has_argument).

    ``canon=True`` additionally maps any deterministic-table fallback
    through config.GOLD_ROLE_CANON so the output vocabulary is
    uniformly the corpus one (RolePair's 'Vulnerable-System' /
    'Patch-Releaser' / ... strings do not occur in the corpus — see
    the config docstring).  Rules-mode callers leave both options at
    their reference-faithful defaults."""
    spark = linked.sparkSession
    has_role = "role" in linked.columns
    upstream = F.col("role") if has_role else F.lit(None).cast("string")

    if provider is not None:
        # linked is referenced twice below (main join + the provider
        # candidate subset); EVENT/ARG-scale multi-reference frames get
        # a truncate barrier so link()'s tie-break join and windows do
        # not re-execute per reference (ADVICE r2; CLAUDE.md barrier
        # policy)
        from ..util import truncate

        linked = truncate(linked)
    lookup = role_lookup_df(spark)
    df = linked.join(F.broadcast(lookup), ["subtype", "arg_type"], "left")
    provided = F.lit(None).cast("string")
    if provider is not None:
        cand = linked if route == "all" else ambiguous_role_candidates(linked)
        preds = provider(cand).select(
            "doc_id", "event_id", "arg_id",
            F.col("role").alias("_provider_role"),
        )
        df = df.join(preds, ["doc_id", "event_id", "arg_id"], "left")
        if route == "all":
            provided = F.col("_provider_role")
        else:
            provided = F.when(
                is_ambiguous_role(F.col("subtype"), F.col("arg_type")),
                F.col("_provider_role"),
            )
    fallback = [F.col("single_role"), F.col("first_role")]
    if canon:
        canon_map = F.create_map(
            *[F.lit(x) for kv in config.GOLD_ROLE_CANON.items() for x in kv])
        fallback = [F.coalesce(canon_map[c], c) for c in fallback]
    df = df.withColumn(
        "role", F.coalesce(upstream, provided, *fallback),
    ).drop("single_role", "first_role")
    if provider is not None:
        df = df.drop("_provider_role")

    # Databreach Number -> look at the next attached argument's role
    # (canon: the corpus calls the data-count role Number-of-Data)
    wnext = Window.partitionBy("doc_id", "event_id").orderBy("arg_id")
    next_role = F.lead("role", 1).over(wnext)
    return df.withColumn(
        "role",
        F.when(
            (F.col("subtype") == "Databreach")
            & (F.col("arg_type") == "Number")
            & (next_role == "Victim"),
            F.lit("Number-of-Victim"),
        )
        .when(
            (F.col("subtype") == "Databreach")
            & (F.col("arg_type") == "Number")
            & (next_role == "Compromised-Data"),
            F.lit("Number-of-Data" if canon else "Number-of-Compromised-Data"),
        )
        .otherwise(F.col("role")),
    )
