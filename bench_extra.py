#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times declared queries one by
one with the noop sink in a fresh session, and captures
``explain("formatted")`` plans for the plan-diff deliverables.

This file is NOT part of the frozen driver contract (bench.py is); it
exists so optimization rounds can isolate a query's computation from the
shared-session bench without touching the frozen harness.

Usage:
  python bench_extra.py --time kg_scc kg_pagerank        # seconds each
  python bench_extra.py --repeat 2 --time kg_scc         # best of N
  python bench_extra.py --explain kg_scc --out plans/r06/kg_scc_before.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    mode = args[0]
    names = args[1:]

    from vectrain_spark.driver_queries import QUERIES
    from vectrain_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=CPUS)
    try:
        if mode == "--explain":
            df = QUERIES[names[0]](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if out_path:
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                with open(out_path, "w") as f:
                    f.write(plan)
                print(f"wrote {out_path}")
            else:
                print(plan)
        elif mode == "--time":
            res: dict[str, float] = {}
            for name in names:
                best = None
                for _ in range(repeat):
                    spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                    t0 = time.time()
                    QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                res[name] = round(best, 3)
                print(f"{name}: {res[name]}s", file=sys.stderr)
            print(json.dumps(res))
        else:
            raise SystemExit(f"unknown mode {mode}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
