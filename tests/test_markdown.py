"""Markdown extraction (llm/markdown): syntax stripping, code-fence
separation (code never leaks into prose), link/heading accounting,
tables, and the Spark operator."""

from __future__ import annotations

from verified_sources_spark.llm.markdown import markdown_extract

MD = b"""# Title one

Some **bold** and *emph* and `inline code` prose.
A [link text](http://e.com/x) and ![alt text](img.png) and <http://auto.link>.

Subtitle
--------

> quoted line
- bullet one
1. numbered item

| h1 | h2 |
|----|----|
| a  | b  |

```python
def f():
    return 1  # not *emphasis*
```

Closing ***strong emph*** text.

~~~
plain fence
~~~
"""


def test_extraction():
    out = markdown_extract(MD)
    assert out["headings"] == ["Title one", "Subtitle"]
    assert out["n_links"] == 1
    assert [b["lang"] for b in out["code_blocks"]] == ["python", None]
    assert out["code_blocks"][0]["code"] == (
        "def f():\n    return 1  # not *emphasis*")
    assert out["code_blocks"][1]["code"] == "plain fence"
    t = out["text"]
    assert "bold" in t and "**" not in t
    assert "link text" in t and "http://e.com/x" not in t
    assert "alt text" in t and "img.png" not in t
    assert "http://auto.link" in t  # autolinks keep the URL
    assert "quoted line" in t and ">" not in t
    assert "bullet one" in t and "- " not in t
    assert "a\tb" in t and "h1\th2" in t  # table cells, separator gone
    assert "def f()" not in t  # code stays OUT of prose
    assert "strong emph" in t and "*" not in t


def test_unterminated_fence_keeps_code():
    out = markdown_extract(b"prose\n\n```py\ncode tail")
    assert out["text"] == "prose"
    assert out["code_blocks"] == [{"lang": "py", "code": "code tail"}]


def test_reference_links_and_refdefs():
    out = markdown_extract(
        b"See [the docs][1] here.\n\n[1]: http://e.com/docs\n")
    assert out["text"] == "See the docs here."
    assert out["n_links"] == 0  # reference defs drop, inline count only


def test_spark_operator(spark):
    from verified_sources_spark.llm.markdown import markdown_docs_extract

    rows = [(1, bytearray(MD)), (2, bytearray(b"plain, no syntax"))]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in markdown_docs_extract(df).collect()}
    assert got[1]["n_code_blocks"] == 2
    assert got[1]["code_langs"] == "python,"
    assert got[2]["text"] == "plain, no syntax"
    assert got[2]["n_code_blocks"] == 0
