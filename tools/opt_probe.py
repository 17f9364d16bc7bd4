"""Round-14 optimization probe: time catalog entries IN ISOLATION with
the bench's exact methodology (build the DataFrame, drain with
``collect()``, min-of-N, ``clearCache()`` between entries) and
optionally freeze each entry's ``explain("formatted")`` under
``plans/r14/<name>_<tag>.txt``.

Why not bench.py: a full 287-entry pass takes ~12 min and its per-entry
numbers carry suite-position noise (JIT warmth, GC debt).  Optimizing
one operator needs a tight loop: probe the entry alone, change the
plan, probe again — guide §1.1's empirical loop.

Usage:
    python tools/opt_probe.py [--sf-dir /root/testdata/sf0.1] [--n 3]
        [--plan-tag before|after] [--noop] names...

- default drain is ``collect()`` (bench-identical; catalog results are
  driver-sized by construction).  ``--noop`` additionally times a
  noop-sink drain (guide §1.4) for entries where collect cost could
  mask plan cost.
- ``--plan-tag X`` writes ``plans/r14/<name>_X.txt`` with the formatted
  plan of the entry's FINAL DataFrame.  For iterative (eager_build)
  entries this shows the post-loop plan over LogicalRDD checkpoints;
  loop-body plans are captured per-entry where a claim needs them.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from state_economics_end_to_end_data_pipeline_spark.plans import load_all  # noqa: E402
from state_economics_end_to_end_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plan-tag", default=None)
    ap.add_argument("--plan-dir", default="r15")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    if args.n < 1:
        print("--n must be >= 1", file=sys.stderr)
        return 2

    spark = get_spark(app_name="opt-probe")
    qs = load_all()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2
    # same warm-up as bench.py: parquet footers + codegen + Python workers
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()

    for name in args.names:
        spark.catalog.clearCache()
        times, noop_times, first = [], [], None
        for i in range(args.n):
            t0 = time.perf_counter()
            df = qs[name].fn(spark, args.sf_dir)
            rows = df.collect()
            dt = time.perf_counter() - t0
            times.append(dt)
            if i == 0:
                first = dt
            if args.noop:
                t0 = time.perf_counter()
                df2 = qs[name].fn(spark, args.sf_dir)
                df2.write.format("noop").mode("overwrite").save()
                noop_times.append(time.perf_counter() - t0)
        msg = (
            f"{name}: min={min(times):.3f}s first={first:.3f}s "
            f"all={[round(t, 3) for t in times]} rows={len(rows)}"
        )
        if noop_times:
            msg += f" noop_min={min(noop_times):.3f}s"
        print(msg)
        if args.plan_tag:
            out = REPO / "plans" / args.plan_dir / f"{name}_{args.plan_tag}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            df = qs[name].fn(spark, args.sf_dir)
            out.write_text(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
            print(f"  plan -> {out.relative_to(REPO)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
