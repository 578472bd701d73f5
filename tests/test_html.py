"""HTML -> text extraction (operators/html.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from scraping_etl_spark.operators.html import (
    html_to_text, html_to_text_sql, with_extracted_text,
)


def _extract(spark, pages):
    df = spark.createDataFrame(pages, "id long, html string")
    return {
        r.id: r.t
        for r in df.select("id", html_to_text("html").alias("t")).collect()
    }


def test_drops_script_style_head_and_comments(spark):
    got = _extract(spark, [(
        1,
        '<head><title>nope</title></head><style>a{x:1}</style>'
        '<script>if(a<b){c()}</script><!-- hidden -->visible',
    )])
    assert got[1] == "visible"


def test_block_tags_become_lines_inline_tags_vanish(spark):
    got = _extract(spark, [(
        1, "<p>one <b>bold</b></p><p>two</p><br>three",
    )])
    assert got[1] == "one bold\ntwo\nthree"


def test_entities_decode_without_double_unescape(spark):
    # '&amp;lt;' is an ESCAPED '&lt;' — it must surface as the literal
    # text '&lt;', never as '<'
    got = _extract(spark, [(1, "a &amp;lt; b &lt; c &nbsp;&#39;")])
    assert got[1] == "a &lt; b < c '"


def test_null_and_tagless_passthrough(spark):
    got = _extract(spark, [(1, None), (2, "  just text  ")])
    assert got[1] is None and got[2] == "just text"


def test_sql_mirror_is_bit_identical_on_adversarial_pages(spark):
    pages = [
        (1, "<div>a</div><script>while(i<n){}</script><p>b&amp;c</p>"),
        (2, "<TABLE><TR><TD>x</TD></TR></TABLE>"),
        (3, "<p class='x' data-y=\"<z>\">attr junk</p>"),
        (4, "unclosed <b>tag"),
        (5, "<style>p{}</style><style>q{}</style>double"),
    ]
    got = _extract(spark, pages)
    con = duckdb.connect()
    con.execute("create table p(id bigint, html varchar)")
    con.executemany("insert into p values (?, ?)", pages)
    want = dict(
        con.execute(
            f"select id, {html_to_text_sql('html')} from p"
        ).fetchall()
    )
    assert got == want


def test_extract_ratio_flags_boilerplate_shells(spark):
    df = spark.createDataFrame(
        [
            (1, "<p>" + "real article text " * 20 + "</p>"),
            (2, "<script>" + "x" * 400 + "</script><p>hi</p>"),
        ],
        "id long, html string",
    )
    out = {r.id: r for r in with_extracted_text(df).collect()}
    assert out[1].extract_ratio > 0.9
    assert out[2].extract_ratio < 0.05
    assert out[2].text == "hi"
