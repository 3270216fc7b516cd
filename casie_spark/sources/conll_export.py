"""CoNLL-style corpus export (S6 interop path, SURVEY §2.1).

Reproduces the reference's ``allfileoutput``/``to_one_file_each``
tab-separated format (link_coref.py:1691-1767) so the reference's own
scorer tooling can consume this engine's output:

- options='last' layout (the coref/scorer input): per document a
  ``#begin document (<fname>);`` header, one ``<fname>\\t<token>\\t
  <offset>\\t<tag>`` line per token, then ``#end document`` + blank;
- the tag column is the trigger tag when non-O, else the argument
  tag, else ``O`` (:1754-1761 precedence);
- plain layout (options absent): no document markers / fname column.

Spark-first shape: line assembly is pure column work over the tagged
token frame; document markers are unioned as synthetic rows sorted
into place by (doc_id, sent order) keys.  ``write_conll`` writes
distributed text partitions range-sorted by document — one global
sort, no driver-side loop; ``conll_string`` is the driver-side helper
for corpus-scale-irrelevant interop (tests, the 1,000-article corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END_SENT = (1 << 31) - 1


def conll_lines(tagged: DataFrame, markers: bool = True) -> DataFrame:
    """tagged tokens -> (doc_id, _s, _t, line), sorted-ready."""
    tag = (
        F.when(F.col("trigger_tag") != "O", F.col("trigger_tag"))
        .when(F.col("arg_tag") != "O", F.col("arg_tag"))
        .otherwise(F.lit("O"))
    )
    doc = F.col("doc_id").cast("string")
    fields = [F.col("token"), F.col("begin").cast("string"), tag]
    if markers:  # options='last' carries the fname column per line
        fields = [doc] + fields
    body = tagged.select(
        doc.alias("doc_id"),
        F.col("sent_id").alias("_s"),
        F.col("token_id").alias("_t"),
        F.concat_ws("\t", *fields).alias("line"),
    )
    if not markers:
        return body
    docs = tagged.select(doc.alias("doc_id")).distinct()
    begin = docs.select(
        "doc_id", F.lit(-1).alias("_s"), F.lit(0).alias("_t"),
        F.concat(F.lit("#begin document ("), F.col("doc_id"),
                 F.lit(");")).alias("line"),
    )
    end = docs.select(
        "doc_id", F.lit(_END_SENT).alias("_s"), F.lit(0).alias("_t"),
        F.lit("#end document").alias("line"),
    ).unionByName(docs.select(
        "doc_id", F.lit(_END_SENT).alias("_s"), F.lit(1).alias("_t"),
        F.lit("").alias("line"),
    ))
    return body.unionByName(begin).unionByName(end)


def write_conll(tagged: DataFrame, path: str, markers: bool = True) -> None:
    """Range-sorted distributed text export (one file per partition,
    documents contiguous and internally ordered)."""
    (conll_lines(tagged, markers)
     .orderBy("doc_id", "_s", "_t")
     .select("line")
     .write.mode("overwrite").text(path))


def read_conll(spark, path: str) -> DataFrame:
    """S4: label-file scan — the exported token-per-line TSV back into
    a token frame (doc_id, token, begin, tag).  The reference's
    ``readPredicted`` (link_coref.py:570-658) walks the file
    sequentially, re-keying on the fname column; here every body line
    already carries its fname, so the parse is embarrassingly parallel
    (no order dependence, marker lines simply filtered out) — the scan
    scales with input splits like any other source."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        lines.filter(~F.col("value").startswith("#")
                     & (F.size(parts) == 4))
        .select(
            parts[0].alias("doc_id"),
            parts[1].alias("token"),
            parts[2].cast("long").alias("begin"),
            parts[3].alias("tag"),
        )
    )


def conll_string(tagged: DataFrame, markers: bool = True) -> str:
    """Driver-side single-string export (reference-file interop for
    bounded corpora; not a crawl-scale path)."""
    rows = (
        conll_lines(tagged, markers)
        .orderBy("doc_id", "_s", "_t")
        .select("line")
        .collect()
    )
    return "\n".join(r["line"] for r in rows) + "\n"
