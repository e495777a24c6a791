"""Dump the physical plans of the bench headline queries to a
markdown artifact (PLANS_r{N}.md) so plan-shape claims are auditable
from the repo: broadcast vs shuffle joins, exchange counts,
whole-stage codegen spans, pushed filters.

Usage: python scripts/plan_dump.py [out.md] [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS_latest.md"
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from bench import HEADLINE

    from crate_spark.queries import load_all
    from crate_spark.session import get_spark

    spark = get_spark("plan-dump", cpus=8, shuffle_partitions=32)
    registry = load_all()
    lines = [
        "# Physical plans — bench headline queries",
        "",
        f"`explain(formatted)` at `{sf_dir}`, AQE on (final plans may",
        "further coalesce at runtime). Summary counts per plan:",
        "exchanges (shuffles), broadcasts, Python eval nodes.",
        "",
    ]
    for name in HEADLINE:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_bc = len(re.findall(r"\(\d+\) Broadcast\w*", plan))
        n_py = len(re.findall(r"EvalPython|InPandas", plan))
        lines += [
            f"## {name}",
            "",
            f"shuffle exchanges: {n_ex} · broadcast nodes: {n_bc} · "
            f"python nodes: {n_py} (AQE may coalesce further at runtime; "
            f"JVM-only execution is pinned suite-wide by "
            f"tests/test_plans.py::test_registry_wide_python_allowlist)",
            "",
            "```",
            plan.strip()[:6000],
            "```",
            "",
        ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
