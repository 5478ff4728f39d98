"""Round-11 wave-3 scale probes: structured-text front doors at 10k
assets on local[32] — feeds, notebooks, markdown, SVG, HEIF probes.

Usage: python tools/soak_r11d.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from verified_sources_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time() - t0:.1f}s ({out} rows)", flush=True)


def main():
    spark = get_spark("soak-r11d")
    spark.sparkContext.setLogLevel("ERROR")

    def over(n, mint):
        import pandas as pd  # noqa: F401

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    def mint_feeds(batches):
        import pandas as pd

        from verified_sources_spark.llm.feeds import encode_atom, encode_rss

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                items = [{"title": f"post {k}", "link": f"http://e/{k}",
                          "description": f"<p>summary {did} {k}</p>",
                          "content": f"<p>body {did} {k}</p>" * 5}
                         for k in range(5)]
                enc = encode_rss if did % 2 == 0 else encode_atom
                if did % 2:
                    for it in items:
                        it["summary"] = it.pop("description")
                rows.append({"doc_id": did, "asset": enc(items)})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mint_nb(batches):
        import pandas as pd

        from verified_sources_spark.llm.notebooks import encode_notebook

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                cells = [("markdown" if k % 2 == 0 else "code",
                          f"line one {did} {k}\nline two\nline three")
                         for k in range(8)]
                rows.append({"doc_id": did, "asset": encode_notebook(
                    cells, outputs_for={1: 2, 3: 1},
                    image_output_for={5})})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mint_md(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                md = "\n".join(
                    [f"# Doc {did}", "",
                     "Intro with **bold** and [a link](http://e.com)."]
                    + [f"- item {k} of `doc {did}`" for k in range(10)]
                    + ["", "```python"]
                    + [f"x{k} = {k}" for k in range(10)]
                    + ["```"]).encode()
                rows.append({"doc_id": did, "asset": md})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    from verified_sources_spark.llm.feeds import feed_extract
    from verified_sources_spark.llm.markdown import markdown_docs_extract
    from verified_sources_spark.llm.notebooks import notebook_extract

    print("structured-text front doors at 10k assets", flush=True)
    timed("feeds (5 entries each)",
          lambda: feed_extract(over(10_000, mint_feeds)).count())
    timed("notebooks (8 cells each)",
          lambda: notebook_extract(over(10_000, mint_nb)).count())
    timed("markdown (README-shaped)",
          lambda: markdown_docs_extract(over(10_000, mint_md)).count())
    spark.stop()


if __name__ == "__main__":
    main()
