"""Jupyter notebook extraction (llm/notebooks): both nbformat
generations, line-array sources, output counting without blob
inlining, refusals, and the Spark operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.notebooks import (
    NotebookError, encode_notebook, notebook_cells,
)

CELLS = [("markdown", "# Title\nsome prose"),
         ("code", "import numpy as np\nx = np.ones(3)"),
         ("code", "print(x)"),
         ("markdown", "closing notes")]


@pytest.mark.parametrize("fmt", [4, 3])
def test_round_trip(fmt):
    d = encode_notebook(CELLS, nbformat=fmt,
                        outputs_for={2: 2}, image_output_for={1})
    got = notebook_cells(d)
    assert [(c["cell_type"], c["source"]) for c in got] == CELLS
    assert got[1]["n_outputs"] == 1 and got[1]["has_image_output"] is True
    assert got[2]["n_outputs"] == 2 and got[2]["has_image_output"] is False
    assert got[0]["n_outputs"] is None  # markdown cells have no outputs
    # the base64 payload must never leak into extracted text
    assert all("aWdub3JlZA" not in c["source"] for c in got)


def test_refusals():
    with pytest.raises(NotebookError, match="not JSON"):
        notebook_cells(b"not json")
    with pytest.raises(NotebookError, match="without nbformat"):
        notebook_cells(b'{"a": 1}')
    with pytest.raises(NotebookError, match="nbformat 2"):
        notebook_cells(b'{"nbformat": 2, "worksheets": []}')
    with pytest.raises(NotebookError, match="cells array"):
        notebook_cells(b'{"nbformat": 4}')
    with pytest.raises(NotebookError, match="worksheets"):
        notebook_cells(b'{"nbformat": 3}')


def test_spark_operator(spark):
    from verified_sources_spark.llm.notebooks import notebook_extract

    rows = [
        (1, bytearray(encode_notebook(CELLS, nbformat=4))),
        (2, bytearray(b"{broken")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got: dict = {}
    for r in notebook_extract(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert [r["cell_idx"] for r in got[1]] == [0, 1, 2, 3]
    assert got[1][1]["cell_type"] == "code"
    assert got[2][0]["decoded_ok"] is False
