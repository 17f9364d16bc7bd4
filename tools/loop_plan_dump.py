"""Capture ROUND-BODY physical plans of the iterative catalog entries.

Iterative entries checkpoint every round, so their post-loop
``explain`` shows only an aggregate over ``Scan ExistingRDD`` -- the
per-round join/aggregate shape every optimization claim is about never
appears in ``tools/opt_probe.py``'s dumps (the r14 verdict's evidence
gap #2).  This tool registers the ``operators.planhook`` hook, builds
each requested entry (building an eager entry RUNS its loop), and
freezes the FIRST occurrence of each round-body tag to
``plans/<dir>/<entry>__<tag>.txt`` as the formatted plan (static plan:
for a claim like "no Exchange above the cached edge relation" the
initial plan is the binding evidence -- EnsureRequirements inserts
exchanges at static planning time).

Usage:
    python tools/loop_plan_dump.py [--sf-dir /root/testdata/sf0.1]
        [--plans-dir plans/r15] names...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from state_economics_end_to_end_data_pipeline_spark.operators import (  # noqa: E402
    planhook,
)
from state_economics_end_to_end_data_pipeline_spark.plans import load_all  # noqa: E402
from state_economics_end_to_end_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans-dir", default="plans/r15")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="loop-plan-dump")
    qs = load_all()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    out_dir = REPO / args.plans_dir
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in args.names:
        spark.catalog.clearCache()
        seen: set[str] = set()

        def hook(tag: str, df, _name=name, _seen=seen) -> None:
            # first round only: every later round has the identical shape
            # (same builders, checkpointed inputs of the same schema)
            if tag in _seen:
                return
            _seen.add(tag)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            p = out_dir / f"{_name}__{tag}.txt"
            p.write_text(plan)
            print(f"  wrote {p.relative_to(REPO)}")

        planhook.HOOK = hook
        try:
            print(f"{name}: building (loop executes at build for eager entries)")
            df = qs[name].fn(spark, str(args.sf_dir))
            # non-eager loops (cluster_labels consumers) run at action time
            if not seen:
                df.limit(1).collect()
            if not seen:
                print(f"  {name}: no round-body tags fired (not an iterative entry?)")
        finally:
            planhook.HOOK = None
    return 0


if __name__ == "__main__":
    sys.exit(main())
