"""Round-start testdata drift check.

The driver regenerates /root/testdata between rounds and details can
change silently -- round 4 lost a day to `ts` columns flipping to
TIMESTAMP_NTZ (isAdjustedToUTC=false), which broke 8 watermark queries
that were green the round before. This tool pins every table's parquet
physical+logical schema in a committed manifest and diffs the live
directories against it in seconds, BEFORE anything is built on top.

Usage:
    python tools/preflight.py            # diff live testdata vs manifest
    python tools/preflight.py --update   # re-pin the manifest (after an
                                         # intentional drift review)

Reads footers only (pyarrow, no Spark session): runs in <1s.
Exit code 0 = clean, 1 = drift (diff printed).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import pyarrow.dataset as ds

REPO = Path(__file__).resolve().parent.parent
MANIFEST = REPO / "tools" / "testdata_manifest.json"
TESTDATA = Path("/root/testdata")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _schema_of(path: Path) -> list[list[str]]:
    """[(name, arrow type string)] -- the arrow repr carries the details
    that bit round 4 (timestamp unit + tz presence), unlike Spark's
    simpleString which collapses NTZ flavors at inference time."""
    schema = ds.dataset(str(path), format="parquet").schema
    return [[f.name, str(f.type)] for f in schema]


def snapshot() -> dict:
    snap: dict[str, dict] = {}
    for sf in sorted(p.name for p in TESTDATA.iterdir() if p.is_dir()):
        tables = {}
        for t in TABLES:
            p = TESTDATA / sf / f"{t}.parquet"
            if p.exists():
                tables[t] = _schema_of(p)
        snap[sf] = tables
    return snap


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="re-pin the manifest to the live testdata")
    args = ap.parse_args()

    live = snapshot()
    if args.update or not MANIFEST.exists():
        MANIFEST.write_text(json.dumps(live, indent=1, sort_keys=True) + "\n")
        print(f"pinned {sum(len(v) for v in live.values())} table schemas "
              f"-> {MANIFEST.relative_to(REPO)}")
        return 0

    pinned = json.loads(MANIFEST.read_text())
    drift: list[str] = []
    for sf, tables in pinned.items():
        for t, cols in tables.items():
            got = live.get(sf, {}).get(t)
            if got is None:
                drift.append(f"{sf}/{t}: MISSING (was {len(cols)} cols)")
            elif got != cols:
                want_d, got_d = dict(map(tuple, cols)), dict(map(tuple, got))
                for name in sorted(set(want_d) | set(got_d)):
                    if want_d.get(name) != got_d.get(name):
                        drift.append(
                            f"{sf}/{t}.{name}: pinned {want_d.get(name)!r} "
                            f"-> live {got_d.get(name)!r}"
                        )
    for sf, tables in live.items():
        for t in tables:
            if t not in pinned.get(sf, {}):
                drift.append(f"{sf}/{t}: NEW (not in manifest)")

    if drift:
        print("TESTDATA DRIFT DETECTED -- review before building "
              "(tools/preflight.py --update to re-pin):")
        for d in drift:
            print(f"  {d}")
        return 1
    n = sum(len(v) for v in pinned.values())
    print(f"preflight clean: {n} table schemas match the pinned manifest")
    return 0


if __name__ == "__main__":
    sys.exit(main())
