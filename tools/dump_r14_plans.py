"""Dump `.explain("formatted")` for named queries to plans/r14/.

Usage: python tools/dump_r14_plans.py --suffix before|after [--out DIR] q1 q2 ...

Run once from a worktree at the pre-change commit (--suffix before) and
once at HEAD (--suffix after); the judge diffs the two. Plans are taken
at sf0.001 (plan shape is scale-invariant; the point is Exchange count,
join strategy, PushedFilters/ReadSchema, codegen spans).
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from icegopher_spark.queries import QUERIES  # noqa: E402
from icegopher_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def main() -> None:
    args = sys.argv[1:]
    suffix = "after"
    out_dir = Path(_REPO) / "plans" / "r14"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--out":
            out_dir = Path(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-dump-r14")
    for name in names:
        df = QUERIES[name].fn(spark, SF)
        txt = plan_of(df).rstrip() + "\n"
        p = out_dir / f"{name}_{suffix}.txt"
        p.write_text(txt)
        print(f"wrote {p} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
