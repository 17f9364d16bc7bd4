"""Per-query shuffle/spill metrics report: runs every catalog query and
records bytes shuffled, records moved, and spill — the measured evidence
behind the shuffle-frugality design claims (a query that is correct but
shuffles its whole input shows up immediately here).

Implementation: the session runs with the UI status server on and the
report reads the public REST status API (api/v1/.../stages) before and
after each query.

Usage: python tools/shuffle_report.py [--sf-dir /root/testdata/sf0.01] [names...]
Writes one JSON line per query and a summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from state_economics_end_to_end_data_pipeline_spark.plans import load_all
    from state_economics_end_to_end_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="shuffle-report", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages() -> dict[int, dict]:
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            data = json.load(r)
        return {s["stageId"]: s for s in data}

    qs = load_all()
    names = args.names or sorted(qs)
    out = []
    for name in names:
        before = set(stages())
        t0 = time.time()
        try:
            qs[name].fn(spark, args.sf_dir).collect()
        except Exception as e:
            print(json.dumps({"query": name, "error": str(e)[:200]}))
            continue
        dt = time.time() - t0
        time.sleep(0.2)  # let the status store catch up
        new = [s for sid, s in stages().items() if sid not in before]
        row = {
            "query": name,
            "sec": round(dt, 2),
            "shuffle_read_mb": round(sum(s["shuffleReadBytes"] for s in new) / 1e6, 3),
            "shuffle_write_mb": round(sum(s["shuffleWriteBytes"] for s in new) / 1e6, 3),
            "shuffle_records": sum(s["shuffleWriteRecords"] for s in new),
            "spill_mb": round(sum(s["diskBytesSpilled"] for s in new) / 1e6, 3),
            "input_mb": round(sum(s["inputBytes"] for s in new) / 1e6, 3),
        }
        out.append(row)
        print(json.dumps(row))
    total_w = sum(r["shuffle_write_mb"] for r in out)
    print(
        json.dumps(
            {"summary": {"queries": len(out), "total_shuffle_write_mb": round(total_w, 1)}}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
