"""Corpus scrubbing (r6): PII redaction + global boilerplate-line removal.

Goldens `pii_redact` / `boilerplate_removal` hash-check both against
DuckDB; these tests pin the edge semantics the oracles can't isolate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.scrub import (
    boilerplate_lines,
    redact_pii_df,
    remove_boilerplate_lines,
)


def test_redact_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.co.uk now"),
            (2, "ssn 123-45-6789 phone 555-867-5309 ip 10.0.300.1"),
            (3, "no pii at all"),
            (4, "two mails: x@y.io and z@w.dev!"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in redact_pii_df(df).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert out[3] == "no pii at all"
    assert out[4] == "two mails: <EMAIL> and <EMAIL>!"


def test_redact_email_before_digits(spark):
    """An address containing digits must become one <EMAIL>, never a
    partial phone/IP match inside it."""
    df = spark.createDataFrame(
        [(1, "reach 555.123.4567@example.com ok")], "doc_id long, text string"
    )
    assert redact_pii_df(df).collect()[0].text == "reach <EMAIL> ok"


def test_boilerplate_threshold_and_order(spark):
    rows = []
    for i in range(20):
        body = f"body-{i}\n\nkeep-{i}"
        if i % 2 == 0:
            body += "\nFOOTER"
        rows.append((i, body))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    freq = {r.line: r.n_docs for r in boilerplate_lines(df, min_docs=10).collect()}
    assert freq == {"FOOTER": 10}
    out = {r.doc_id: r.text for r in remove_boilerplate_lines(df, min_docs=10).collect()}
    # frequent line dropped, blank line and order preserved
    assert out[4] == "body-4\n\nkeep-4"
    assert out[3] == "body-3\n\nkeep-3"
    # below threshold nothing is dropped
    out11 = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(df, min_docs=11).collect()
    }
    assert out11[4] == "body-4\n\nkeep-4\nFOOTER"


def test_boilerplate_all_lines_removed_yields_empty(spark):
    rows = [(i, "SAME") for i in range(12)] + [(99, "unique text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in remove_boilerplate_lines(df, min_docs=10).collect()}
    assert out[0] == ""
    assert out[99] == "unique text"
    # passthrough columns and row count intact
    assert len(out) == 13


def test_boilerplate_counts_distinct_docs_not_occurrences(spark):
    """A line repeated many times INSIDE one doc must not count as
    frequent — the rule is distinct-document frequency."""
    df = spark.createDataFrame(
        [(1, "\n".join(["spam"] * 50)), (2, "other")], "doc_id long, text string"
    )
    assert boilerplate_lines(df, min_docs=10).count() == 0


# --------------------------------------------------- C4 rules (X53)
def test_c4_line_and_page_rules(spark):
    from oracle_vectorsearch_example_spark.functions.scrub import c4_clean_df

    rows = [
        (1, "This is a good sentence with many words.\nShort line.\n"
            "Another fine long sentence ends here!\n"
            "And a third proper sentence question mark?"),
        (2, "no terminal punctuation on this line at all\nalso none here my friend"),
        (3, "Enable javascript to view this page properly.\n"
            "A good long sentence that survives intact."),
        (4, "function foo() { return 1; } is a code sentence here.\n"
            "More good words in a sentence here.\n"
            "Third one is also quite fine today.\n"
            "Fourth keeps the page alive maybe."),
        (5, "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
            "Second sentence is long and fine here.\n"
            "Third sentence keeps it valid too."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean_df(df).collect()}
    assert out[1]["c4_keep"] is True and out[1]["n_lines_kept"] == 3
    assert "Short line." not in out[1]["text"]
    assert out[2]["n_lines_kept"] == 0 and out[2]["c4_keep"] is False
    assert "javascript" not in out[3]["text"]
    assert out[3]["c4_keep"] is False  # 1 sentence < 3
    assert out[4]["c4_keep"] is False  # curly brace page
    assert out[5]["c4_keep"] is False  # lorem ipsum page


def test_c4_bad_words_and_no_udf(spark):
    from oracle_vectorsearch_example_spark.functions.scrub import c4_clean_df

    df = spark.createDataFrame(
        [(1, "A perfectly fine sentence with the word badterm inside here.\n"
             "Second good sentence follows right after this one.\n"
             "Third sentence completes the page nicely now.")],
        "doc_id long, text string",
    )
    [clean] = c4_clean_df(df).collect()
    assert clean["c4_keep"] is True
    [flagged] = c4_clean_df(df, bad_words=["BADTERM"]).collect()
    assert flagged["c4_keep"] is False
    plan = c4_clean_df(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan
