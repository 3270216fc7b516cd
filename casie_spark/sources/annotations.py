"""Gold CASIE annotations as DataFrames.

The reference keeps gold as nested JSON per document
(data/annotation/10001.json; structure measured in SURVEY.md section
1.1).  Here it becomes three normalized tables via one explicit-schema
``spark.read.json`` + two ``explode`` projections — no Python touches
the rows:

- gold_events(doc_id, hopper_id, hopper_relation, event_index, subtype,
              realis, nugget_text, nugget_begin, nugget_end)
- gold_arguments(doc_id, event_index, subtype, arg_index, arg_type,
                 role, text, begin, end, wikidataid)
- gold_triples — the parity oracle: (doc_id, event_index) x arguments
  as (subj=nugget, pred=role, obj=arg text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANNOTATION_SCHEMA = T.StructType([
    T.StructField("sourcefile", T.StringType()),
    T.StructField("info", T.StructType([
        T.StructField("title", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("link", T.StringType()),
    ])),
    T.StructField("content", T.StringType()),
    T.StructField("cyberevent", T.StructType([
        T.StructField("hopper", T.ArrayType(T.StructType([
            T.StructField("relation", T.StringType()),
            T.StructField("index", T.LongType()),
            T.StructField("events", T.ArrayType(T.StructType([
                T.StructField("index", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("subtype", T.StringType()),
                T.StructField("realis", T.StringType()),
                T.StructField("nugget", T.StructType([
                    T.StructField("startOffset", T.LongType()),
                    T.StructField("endOffset", T.LongType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("index", T.StringType()),
                ])),
                T.StructField("argument", T.ArrayType(T.StructType([
                    T.StructField("startOffset", T.LongType()),
                    T.StructField("endOffset", T.LongType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("type", T.StringType()),
                    T.StructField("index", T.StringType()),
                    T.StructField("role", T.StructType([
                        T.StructField("type", T.StringType()),
                    ])),
                    T.StructField("external_reference", T.StructType([
                        T.StructField("wikidataid", T.StringType()),
                        T.StructField("wikidataidOfKeyEntityMention", T.StringType()),
                    ])),
                ]))),
            ]))),
        ]))),
    ])),
])


def load_annotations(spark: SparkSession,
                     path: str = "/root/reference/data/annotation/*.json") -> DataFrame:
    df = spark.read.schema(ANNOTATION_SCHEMA).option("multiLine", "true").json(path)
    return df.withColumn(
        "doc_id", F.regexp_extract("sourcefile", r"(\d+)\.txt$", 1)
    )


def gold_events(ann: DataFrame) -> DataFrame:
    h = ann.select(
        "doc_id",
        F.posexplode("cyberevent.hopper").alias("hopper_pos", "hopper"),
    )
    e = h.select(
        "doc_id",
        F.col("hopper.index").alias("hopper_id"),
        F.col("hopper.relation").alias("hopper_relation"),
        F.explode("hopper.events").alias("ev"),
    )
    return e.select(
        "doc_id", "hopper_id", "hopper_relation",
        F.col("ev.index").alias("event_index"),
        F.col("ev.subtype").alias("subtype"),
        F.col("ev.realis").alias("realis"),
        F.col("ev.nugget.text").alias("nugget_text"),
        F.col("ev.nugget.startOffset").alias("nugget_begin"),
        F.col("ev.nugget.endOffset").alias("nugget_end"),
        F.col("ev.argument").alias("arguments"),
    )


def gold_arguments(ann: DataFrame) -> DataFrame:
    ev = gold_events(ann)
    return ev.select(
        "doc_id", "event_index", "subtype", "nugget_text", "nugget_begin",
        F.explode("arguments").alias("a"),
    ).select(
        "doc_id", "event_index", "subtype", "nugget_text", "nugget_begin",
        F.col("a.index").alias("arg_index"),
        F.col("a.type").alias("arg_type"),
        F.col("a.role.type").alias("role"),
        F.col("a.text").alias("text"),
        F.col("a.startOffset").alias("begin"),
        F.col("a.endOffset").alias("end"),
        F.col("a.external_reference.wikidataid").alias("wikidataid"),
    )


def gold_triples(ann: DataFrame) -> DataFrame:
    """Parity oracle: one (subj, pred, obj) per gold argument."""
    args = gold_arguments(ann)
    return args.select(
        "doc_id",
        F.col("nugget_text").alias("subj"),
        F.coalesce("role", F.lit("has_argument")).alias("pred"),
        F.col("text").alias("obj"),
        F.col("subtype").alias("event_subtype"),
        "event_index", "arg_type", "begin", "nugget_begin",
    )
