"""The ``documents`` input table (BASELINE.json ``input_hint``):

    documents(url string, warc_ts timestamp, html binary,
              text string, lang string)

Three providers:

1. ``load_documents`` — production path: Iceberg table if the runtime
   has the connector on the classpath, else a parquet directory.  The
   scan benefits from Iceberg partition pruning on
   (crawl_date, lang, bucket(url)); in the sandbox it is plain parquet.
2. ``synth_documents`` — deterministic seeded corpus in CASIE
   source-file shape (reference data/source/10001.txt:1-5) with
   Zipf-skewed domains so skew handling is exercised.  Generated
   *distributed* (spark.range -> column exprs + one Arrow stage), so it
   works at any scale; content is a pure function of doc id (stable
   under repartitioning).
3. ``load_reference_corpus`` — the 1,000-article CASIE corpus read from
   ``/root/reference/data/source`` for the parity tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import with_extracted_columns

DOCUMENTS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def load_documents(spark: SparkSession, location: str) -> DataFrame:
    """Read the documents table (Iceberg when available, else parquet)."""
    if not location.startswith(("/", "file:", "s3:", "hdfs:")):
        try:
            return spark.read.format("iceberg").load(location)
        except Exception:
            return spark.table(location)
    return spark.read.parquet(location)


# --- deterministic synthetic corpus ---------------------------------------
# Sentence templates seeded with known-true spans for every tagging
# stage (FIXTURES.md section 1): CASIE triggers, CVE ids, versions,
# money, dates, vendor gazetteer names.
_VENDORS = ["Adobe", "Microsoft", "Cisco", "Oracle", "Siemens", "Apple",
            "Google", "Mozilla", "Intel", "Samsung"]
_PRODUCTS = ["Flash Player", "Windows 10", "IOS XE", "WebLogic",
             "SIMATIC", "Safari", "Chrome", "Firefox", "ME Firmware",
             "Galaxy S9"]
_TEMPLATES = [
    # (template, event subtype planted)
    ("Hackers breached the servers of {vendor} and stole customer records.", "Databreach"),
    ("Researchers discovered a critical flaw in {product} tracked as {cve}.", "DiscoverVulnerability"),
    ("{vendor} released a patch for {cve} affecting {product} version {ver}.", "PatchVulnerability"),
    ("Attackers demanded a ransom of {money} in bitcoin to unlock the files.", "Ransom"),
    ("A phishing campaign impersonated {vendor} to trick users into entering credentials.", "Phishing"),
    ("The data breach exposed {num} email addresses and passwords.", "Databreach"),
    ("{vendor} fixed the vulnerability {cve} in {product} {ver} last week.", "PatchVulnerability"),
    ("Criminals used ransomware to extort {money} from the hospital.", "Ransom"),
    ("The spear phishing emails lure victims with fake invoices from {vendor}.", "Phishing"),
    ("A security researcher disclosed the bug {cve} in {product}.", "DiscoverVulnerability"),
]
_FILLER = [
    "The company said it is investigating the incident.",
    "Users are advised to update their software immediately.",
    "No further details were provided at this time.",
    "The report was published on Tuesday.",
    "Officials declined to comment on the matter.",
]


def _synth_body(doc_id: int) -> tuple[str, str]:
    """Pure function doc_id -> (title, body). Deterministic, no RNG state."""
    # xorshift-style mixing keeps it dependency-free and stable
    h = (doc_id * 2654435761) & 0xFFFFFFFF
    n_sent = 3 + (h % 6)
    parts = []
    for s in range(n_sent):
        hs = (h ^ (s * 40503 + 2699)) * 2654435761 & 0xFFFFFFFF
        if hs % 3 == 0:
            parts.append(_FILLER[hs % len(_FILLER)])
        else:
            tmpl, _ = _TEMPLATES[hs % len(_TEMPLATES)]
            parts.append(
                tmpl.format(
                    vendor=_VENDORS[hs % len(_VENDORS)],
                    product=_PRODUCTS[(hs >> 3) % len(_PRODUCTS)],
                    cve=f"CVE-{2015 + hs % 10}-{1000 + hs % 9000}",
                    ver=f"{hs % 12}.{(hs >> 4) % 10}.{(hs >> 8) % 5}",
                    money=f"${(hs % 90) * 1000 + 5000}",
                    num=f"{(hs % 500) + 17} million",
                )
            )
    title = parts[0].rstrip(".")[:80]
    return title, "\n".join(parts)


def synth_documents(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """n deterministic CASIE-shaped pages; Zipf-ish skewed domains.

    Distributed generation: spark.range drives ids; one mapInPandas
    renders bodies (string templating — Arrow batch path).
    """
    import pandas as pd  # local import: executors

    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def render(batches):
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            urls, htmls, texts, titles = [], [], [], []
            for i in ids:
                i = int(i)
                title, body = _synth_body(i)
                # Zipf-ish: domain j with weight ~ 1/(j+1); invert via mod trick
                h = (i * 11400714819323198485) & 0xFFFFFFFF
                dom = 0
                r = h % 100
                for j, cum in enumerate((50, 75, 87, 93, 96, 98, 99, 100)):
                    if r < cum:
                        dom = j
                        break
                url = f"https://news-{dom}.example/{i}"
                date = f"{2015 + i % 10}_{1 + i % 12:02d}_{1 + i % 28:02d}"
                raw = (
                    f"<title>{title}</title>\n<source> {url} </source>\n"
                    f"<date> {date} </date>\n<text>\n{body}"
                )
                urls.append(url)
                htmls.append(raw.encode("utf-8"))
                texts.append(raw[raw.index("<text>") + 7:])
                titles.append(title)
            yield pd.DataFrame({
                "url": urls,
                "id": ids.values,
                "html": htmls,
                "text": texts,
            })

    rendered = base.mapInPandas(render, schema="url string, id long, html binary, text string")
    return rendered.select(
        "url",
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=(F.col("id") % 86400).cast("double"))).alias("warc_ts"),
        "html",
        "text",
        F.when(F.col("id") % 41 == 0, "de").otherwise("en").alias("lang"),
    )


def load_reference_corpus(spark: SparkSession, source_dir: str = "/root/reference/data/source") -> DataFrame:
    """CASIE 1,000-article corpus -> documents-shaped DataFrame.

    doc_id is the numeric file stem (10001..11000); header columns are
    extracted with the byte-identical utils.py:6-8 semantics.
    """
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.txt")
        .load(source_dir)
        .select(
            F.regexp_extract(F.input_file_name(), r"(\d+)\.txt$", 1).alias("doc_id"),
            F.col("value").alias("html_str"),
        )
    )
    return with_extracted_columns(raw, "html_str").withColumn(
        "url", F.col("source_url")
    )
