"""Dump .explain('formatted') for headline queries to plans/r16/<q>_<tag>.txt."""
import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # noqa: E402
from verified_sources_spark.plans.queries import QUERIES  # noqa: E402
from verified_sources_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main(tag: str, names=None) -> None:
    spark = get_spark("plan-dump-r16")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names or HEADLINE:
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"/root/repo/plans/r16/{name}_{tag}.txt", "w") as f:
            f.write(buf.getvalue())
        print("dumped", name)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "before", sys.argv[2:] or None)
