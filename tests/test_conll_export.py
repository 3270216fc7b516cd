"""CoNLL exporter golden test — format hand-traced from
allfileoutput/to_one_file_each (link_coref.py:1691-1767)."""

from __future__ import annotations

from casie_spark.sources.conll_export import (
    conll_string,
    read_conll,
    write_conll,
)


def _tagged(spark):
    rows = [
        # doc, sent, tok, token, begin, trigger_tag, arg_tag
        ("doc1", 0, 0, "Hackers", 0, "O", "B-Person"),
        ("doc1", 0, 1, "stole", 8, "B-Databreach", "O"),
        ("doc1", 0, 2, "data", 14, "O", "B-Data"),
        ("doc2", 0, 0, "Patched", 0, "B-PatchVulnerability", "O"),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, sent_id int, token_id int, token string, "
              "begin int, trigger_tag string, arg_tag string")


def test_conll_string_last_format(spark):
    got = conll_string(_tagged(spark))
    assert got == (
        "#begin document (doc1);\n"
        "doc1\tHackers\t0\tB-Person\n"
        "doc1\tstole\t8\tB-Databreach\n"
        "doc1\tdata\t14\tB-Data\n"
        "#end document\n"
        "\n"
        "#begin document (doc2);\n"
        "doc2\tPatched\t0\tB-PatchVulnerability\n"
        "#end document\n"
        "\n"
    )


def test_conll_plain_format_and_write(spark, tmp_path):
    got = conll_string(_tagged(spark), markers=False)
    assert got.splitlines()[0] == "Hackers\t0\tB-Person"
    assert all("#begin" not in ln for ln in got.splitlines())

    out = str(tmp_path / "conll")
    write_conll(_tagged(spark), out)
    back = spark.read.text(out)
    assert back.count() == 4 + 3 * 2  # tokens + 3 marker lines per doc

    # S4 round trip: the label-file scan recovers every token row
    rows = {(r["doc_id"], r["begin"]): (r["token"], r["tag"])
            for r in read_conll(spark, out).collect()}
    assert rows[("doc1", 8)] == ("stole", "B-Databreach")
    assert rows[("doc2", 0)] == ("Patched", "B-PatchVulnerability")
    assert len(rows) == 4
