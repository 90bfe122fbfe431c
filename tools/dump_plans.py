"""Dump .explain("formatted") for bench queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
  tag     subdirectory under plans/ (e.g. r11)
  suffix  appended to the file name (e.g. before / after)

Defaults to the bench set when no query names are given.  Also prints a
one-line plan-shape summary (Exchange count, join operators, Python
eval nodes) per query so before/after diffs are quick to read.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from airflow_embeddings_pipeline_spark.plans import get_catalog
    from airflow_embeddings_pipeline_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    catalog = get_catalog()
    if not names:
        names = [n for n, q in catalog.items() if q.bench]

    for name in names:
        q = catalog[name]
        try:
            df = q.build(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # pragma: no cover - diagnostic tool
            text = f"ERROR building {name}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        joins = sorted(set(re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", text)))
        py = sorted(set(re.findall(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas)\b", text)))
        print(f"{name}: Exchange={n_ex} joins={joins} py={py}")


if __name__ == "__main__":
    main()
