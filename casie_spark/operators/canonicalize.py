"""Entity canonicalization (SURVEY.md section 2.9 corpus-scale analog;
BASELINE.json north_star: broadcast dictionary of CVE ids and
vendor/product names + MinHash-LSH connected-components surface-form
clustering).

Three layers:

1. ``apply_dictionary`` — broadcast join against the canonical
   dictionary (CVE ids normalized by regex, vendor/product gazetteer,
   optional wikidata anchors mirroring the reference's
   external_reference.wikidataid hooks, wd_search.py:75-122).  The
   reference queried live Wikidata/DBpedia SPARQL (wd_search.py:153-201)
   — at 10^12 pages live calls are impossible, so the dictionary is
   pre-resolved and broadcast (SURVEY.md section 2.1 S8).
2. ``minhash_edges`` — surface forms that miss the dictionary are
   clustered: char-3-shingles -> K xxhash64 min-signatures -> banded
   buckets -> candidate pairs -> exact Jaccard verification.  All
   JVM-side (transform/aggregate/xxhash64 on arrays).
3. ``connected_components`` — iterative min-label propagation over the
   candidate edges (no GraphFrames dependency); converges in
   O(component diameter) joins, each keyed on the label column with
   AQE handling skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..util import materialize, truncate

_VENDORS = {
    "adobe": "vendor:adobe", "microsoft": "vendor:microsoft",
    "cisco": "vendor:cisco", "oracle": "vendor:oracle",
    "siemens": "vendor:siemens", "apple": "vendor:apple",
    "google": "vendor:google", "mozilla": "vendor:mozilla",
    "intel": "vendor:intel", "samsung": "vendor:samsung",
    "equifax": "vendor:equifax", "yahoo": "vendor:yahoo",
}


def build_dictionary(spark: SparkSession, extra: DataFrame | None = None) -> DataFrame:
    """(surface, canonical_id, entity_type) broadcast dictionary."""
    rows = [(k, v, "Organization") for k, v in _VENDORS.items()]
    df = spark.createDataFrame(
        rows, "surface string, canonical_id string, entity_type string"
    )
    if extra is not None:
        df = df.unionByName(extra.select("surface", "canonical_id", "entity_type"))
    return df


def default_dictionary(spark: SparkSession) -> DataFrame:
    """The dictionary graph builds use when the caller passes none:
    the vendor seed table plus the gold ``external_reference.
    wikidataid`` anchors whenever the reference annotations are
    readable (r2 VERDICT missing #5 — the 4,613-anchor dictionary
    existed but nothing defaulted it in).  Anchors win surface
    conflicts (a ``wd:`` id is the stronger canonical form than a
    ``vendor:`` slug); the anti-join keeps the union deterministic.
    Still a broadcast-scale frame (~4.6k rows) — truncated to a plan
    leaf so the annotation-JSON parse lineage (a ~MB analyzed-plan
    string) never renders inside the downstream canonicalize joins
    (the maxPlanStringLength regression gate, CLAUDE.md)."""
    import glob

    base = build_dictionary(spark)
    if not glob.glob("/root/reference/data/annotation/*.json"):
        return base
    from ..sources.annotations import gold_arguments, load_annotations
    from ..util import truncate

    anchors = wikidata_anchors(gold_arguments(load_annotations(spark)))
    return truncate(anchors.unionByName(
        base.join(anchors.select("surface"), "surface", "left_anti")
    ))


def wikidata_anchors(gold_arguments: DataFrame) -> DataFrame:
    """Dictionary entries from the gold external_reference.wikidataid
    anchors (4,613 arguments carry one — SURVEY.md section 1.3)."""
    return (
        gold_arguments.filter(F.col("wikidataid").isNotNull())
        .select(
            F.lower(F.col("text")).alias("surface"),
            F.concat(F.lit("wd:"), F.col("wikidataid")).alias("canonical_id"),
            F.col("arg_type").alias("entity_type"),
        )
        .groupBy("surface")
        .agg(
            F.min("canonical_id").alias("canonical_id"),
            F.min("entity_type").alias("entity_type"),
        )
    )


def normalize_cve(col):
    """CVE surfaces self-canonicalize by regex (parseJsontoFeatures.py:223-228)."""
    return F.when(
        F.upper(col).rlike(r"^CVE-\d+-\d+$"), F.upper(col)
    )


def apply_dictionary(entities: DataFrame, dictionary: DataFrame,
                     surface_col: str = "surface") -> DataFrame:
    """entities + canonical_id (null where unresolved)."""
    d = dictionary.select(
        F.col("surface").alias("_d_surface"),
        F.col("canonical_id").alias("_d_canonical"),
    )
    out = entities.join(
        F.broadcast(d),
        F.lower(F.col(surface_col)) == F.col("_d_surface"),
        "left",
    ).drop("_d_surface")
    return out.withColumn(
        "canonical_id",
        F.coalesce(normalize_cve(F.col(surface_col)), F.col("_d_canonical")),
    ).drop("_d_canonical")


def shingles(col, n: int = 3):
    """Char n-gram shingle array of a lowercased surface (JVM-side)."""
    padded = F.lower(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(padded) - n, F.lit(0))),
            lambda i: padded.substr(i + 1, F.lit(n)),
        )
    )


def minhash_edges(surfaces: DataFrame, id_col: str = "surface_id",
                  surface_col: str = "surface", n_hashes: int = 16,
                  bands: int = 8, threshold: float = 0.5) -> DataFrame:
    """Candidate near-identical surface pairs -> verified Jaccard edges.

    Returns (src, dst) with src < dst.
    """
    rows_per_band = n_hashes // bands
    sh = surfaces.select(
        F.col(id_col).alias("sid"),
        shingles(F.col(surface_col)).alias("sh"),
    ).filter(F.size("sh") > 0)

    def minhash(seed: int):
        return F.array_min(
            F.transform("sh", lambda s: F.xxhash64(F.concat(F.lit(str(seed)), s)))
        )

    sig = sh.select(
        "sid", "sh", *[minhash(k).alias(f"h{k}") for k in range(n_hashes)]
    )
    band_cols = [
        F.hash(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(f"band{b}")
        for b in range(bands)
    ]
    # sig is referenced twice per band below; materialize eagerly or the
    # whole upstream lineage re-executes 2*bands times
    sig = materialize(sig.select("sid", "sh", *band_cols))

    pairs = None
    max_bucket = 1000  # LSH skew guard: an over-full band bucket means a
    # boilerplate surface shared by k docs — k² pairs with no near-dup
    # signal; drop it before the self-join (same rule as
    # dedup.minhash_candidate_pairs).  The size window rides the join's
    # own hashpartitioning(bk) exchange.
    for b in range(bands):
        banded = sig.select("sid", "sh", F.col(f"band{b}").alias("bk"))
        bw = Window.partitionBy("bk")
        banded = (
            banded.withColumn("_bsz", F.count("*").over(bw))
            .filter(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
        left = banded.select(F.col("sid").alias("src"), F.col("sh").alias("sh1"),
                             "bk")
        right = banded.select(F.col("sid").alias("dst"), F.col("sh").alias("sh2"),
                              "bk")
        p = left.join(right, "bk").filter(F.col("src") < F.col("dst")).drop("bk")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["src", "dst"])

    jac = F.size(F.array_intersect("sh1", "sh2")) / F.size(F.array_union("sh1", "sh2"))
    return pairs.filter(jac >= threshold).select("src", "dst")


def connected_components(edges: DataFrame, vertices: DataFrame,
                         id_col: str = "sid", max_iter: int = 15) -> DataFrame:
    """Min-label propagation: (id, component) with component = min id
    reachable.  Each iteration is two shuffles; terminates early when
    no label changes."""
    labels = materialize(
        vertices.select(F.col(id_col).alias("id")).withColumn("label", F.col("id"))
    )
    sym = materialize(
        edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id, "inner")
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_chg"),
            )
        )
        # truncate, not materialize: each iteration's plan embeds the
        # previous one — persist alone lets the tree grow exponentially
        new_labels = truncate(new_labels)
        changed = new_labels.filter(F.coalesce("_chg", F.lit(False))).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("component"))


def canonicalize_surfaces(entities: DataFrame, dictionary: DataFrame,
                          surface_col: str = "obj") -> DataFrame:
    """Full canonicalization: dictionary first; unresolved surfaces are
    LSH-clustered and take ``cluster:<min-surface-of-component>`` ids.

    entities: any DataFrame with a surface column; returns + canonical_id.
    """
    spark = entities.sparkSession
    withdict = apply_dictionary(entities, dictionary, surface_col)

    unresolved = (
        withdict.filter(F.col("canonical_id").isNull())
        .select(F.lower(F.col(surface_col)).alias("surface"))
        .distinct()
        .withColumn("surface_id", F.xxhash64("surface"))
    )
    unresolved = materialize(unresolved)

    edges = minhash_edges(unresolved)
    comp = connected_components(
        edges, unresolved.select(F.col("surface_id").alias("sid")), "sid"
    )
    rep = (
        unresolved.join(comp, unresolved.surface_id == comp.sid, "left")
        .select(
            "surface",
            F.coalesce("component", F.col("surface_id")).alias("component"),
        )
    )
    canon = (
        rep.groupBy("component")
        .agg(F.min("surface").alias("rep_surface"))
    )
    mapping = rep.join(canon, "component").select(
        F.col("surface").alias("_m_surface"),
        F.concat(F.lit("cluster:"), F.col("rep_surface")).alias("_m_canonical"),
    )
    out = withdict.join(
        mapping,
        F.lower(F.col(surface_col)) == F.col("_m_surface"),
        "left",
    ).drop("_m_surface")
    return out.withColumn(
        "canonical_id", F.coalesce("canonical_id", "_m_canonical")
    ).drop("_m_canonical")
