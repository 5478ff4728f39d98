"""LaTeX source stripping (llm/latex): markup semantics, math/float
removal, caption rescue, refusals, and the Spark operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.latex import (
    LatexError,
    encode_latex,
    latex_extract,
    latex_extract_op,
    latex_text,
)


def test_paper_round_trip():
    d = encode_latex("A Study", [
        ("Intro", "We study \\emph{important} things~here."),
        ("Methods", "Cited \\cite{k99} work shows 50\\% gains."),
    ])
    out = latex_extract(d)
    assert out["title"] == "A Study"
    assert out["headings"] == ["Intro", "Methods"]
    assert out["text"] == (
        "A Study\nIntro\nWe study important things here.\n"
        "A caption worth keeping\nMethods\n"
        "Cited work shows 50% gains.")


def test_markup_semantics():
    cases = [
        # comments die at EOL; \% is a literal
        ("\\section{S}\nkeep % drop this\nand 100\\% kept",
         "S\nkeep and 100% kept"),
        # math forms all drop whole
        ("\\section{S}\na $x^2 + y$ b $$\\frac{1}{2}$$ c \\(z\\) d "
         "\\[q\\] e", "S\na b c d e"),
        # nested braces in kept commands
        ("\\section{S}\n\\textbf{bold {nested \\emph{deep}} text}",
         "S\nbold nested deep text"),
        # unknown commands swallow ONE braced arg, emit nothing
        ("\\section{S}\n\\href{http://x}x \\vspace{2em}y",
         "S\nx y"),
        # \item becomes a line break inside itemize (recursed env)
        ("\\section{S}\n\\begin{itemize}\\item one\\item two"
         "\\end{itemize}", "S\none\ntwo"),
        # verbatim env drops (code is not prose); \verb kept literal
        ("\\section{S}\n\\begin{verbatim}x = 1\\end{verbatim}"
         "run \\verb|f(x)| now", "S\nrun f(x) now"),
        # escapes and ties
        ("\\section{S}\nA\\&B C\\_D \\{x\\} a~b", "S\nA&B C_D {x} a b"),
        # \\ is a line break -> paragraph split
        ("\\section{S}\nline one\\\\line two", "S\nline one\nline two"),
    ]
    for src, want in cases:
        assert latex_text(src)["text"] == want, src


def test_abstract_and_footnote():
    src = ("\\documentclass{article}\\begin{document}"
           "\\begin{abstract}The abstract prose.\\end{abstract}"
           "\\section{S}Body\\footnote{a note} text."
           "\\end{document}")
    out = latex_text(src)
    assert out["text"] == "The abstract prose.\nS\nBody a note text."


def test_preamble_dropped_without_document_env():
    # headerless snippet: whole file is body
    out = latex_text("\\section{Only}\nsnippet body")
    assert out["text"] == "Only\nsnippet body"
    assert out["headings"] == ["Only"]


def test_refusals():
    with pytest.raises(LatexError, match="not a .tex source"):
        latex_text("plain prose, no tex at all")
    with pytest.raises(LatexError, match="unbalanced"):
        latex_text("\\section{S}\nbad { group")
    with pytest.raises(LatexError, match="unclosed environment"):
        latex_text("\\section{S}\\begin{figure}never ends")
    with pytest.raises(LatexError, match="unterminated math"):
        latex_text("\\section{S}\nbad $x + y")


def test_spark_operator(spark):
    rows = [(1, bytearray(encode_latex("T", [("S", "body")]))),
            (2, bytearray(b"not tex"))]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in latex_extract_op(df).collect()}
    assert got[1]["decoded_ok"] is True and got[1]["title"] == "T"
    assert got[1]["headings"] == "S"
    assert got[2]["decoded_ok"] is False
