"""Record the current per-query source fingerprints into
QUERY_SOURCE_HASHES.json (the re-sample-on-rewrite sidecar).

Run at round end, before the final commit: the snapshot tagged with
the live round number records the code state the driver's
CORRECTNESS_r{round}.json will be computed from. The registry's
front-loading (xetl_spark/queries/_stale_rewrites) then treats any
query whose fingerprint drifts from the snapshot matching its latest
driver sample as never-sampled, so rewrites are re-verified in the
next driver window instead of coasting on stale green rows
(VERDICT r8 item 5).

Usage: python tools/record_query_hashes.py [--round N]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MAX_SNAPSHOTS = 12  # bound file growth; older rounds are all-sampled anyway


def main() -> int:
    import xetl_spark.queries as Q

    args = sys.argv[1:]
    if "--round" in args:
        rnd = int(args[args.index("--round") + 1])
    else:
        rnd = Q._round_number()
    path = REPO / "QUERY_SOURCE_HASHES.json"
    try:
        sidecar = json.loads(path.read_text())
    except (OSError, ValueError):
        sidecar = {}
    if not isinstance(sidecar, dict):
        sidecar = {}
    snapshots = [
        s
        for s in (sidecar.get("snapshots") or [])
        if isinstance(s, dict) and int(s.get("round", -1)) != rnd
    ]
    snapshots.append({"round": rnd, "hashes": Q.source_hashes()})
    snapshots.sort(key=lambda s: int(s.get("round", -1)))
    sidecar["snapshots"] = snapshots[-MAX_SNAPSHOTS:]
    sidecar.setdefault("rewritten", {})
    path.write_text(json.dumps(sidecar, indent=1, sort_keys=True) + "\n")
    n = len(snapshots[-1]["hashes"])
    print(f"recorded round={rnd}: {n} query fingerprints -> {path.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
