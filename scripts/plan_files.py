"""Write per-query `.explain("formatted")` files for the optimization
round's evidence: plans/r{N}/<query>_<tag>.txt.

Usage: python scripts/plan_files.py <outdir> <tag> [query ...]
       (default queries: the bench HEADLINE list)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402

from crate_spark.queries import load_all  # noqa: E402
from crate_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = Path(sys.argv[1])
    tag = sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-files", cpus=8)
    registry = load_all()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_bc = len(re.findall(r"\(\d+\) Broadcast\w*", plan))
        n_py = len(re.findall(r"EvalPython|InPandas", plan))
        header = (
            f"# {name} — explain(formatted) at {sf_dir} [{tag}]\n"
            f"# shuffle exchanges: {n_ex} · broadcast nodes: {n_bc} · "
            f"python nodes: {n_py}\n\n"
        )
        (outdir / f"{name}_{tag}.txt").write_text(header + plan.strip() + "\n")
        print(f"wrote {outdir / f'{name}_{tag}.txt'}")
    spark.stop()


if __name__ == "__main__":
    main()
