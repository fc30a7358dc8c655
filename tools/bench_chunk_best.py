"""Chunk refresh with provenance: run bench.py on the named queries and
COMMIT THE NEW RUN'S VALUES unconditionally (cold and warm), recording
the displaced prior series alongside so the artifact keeps both.

History (r13 verdict §What's-wrong 2): the original version kept the
"better" of (prior, new) per row — tighter warm triple, minimum cold.
That min-over-runs estimator makes BENCH_FULL.json monotonically
improve by construction and can hide a real cold regression behind a
stale calm-window prior, so it was retired in r14. The committed value
is now always the newest run, measured in a probed-calm window
(tools/box_probe.py first); prior values stay visible in
"chunk_best_adjudication" for storm triage but never override.

Run: python tools/bench_chunk_best.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULL = os.path.join(REPO, "BENCH_FULL.json")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        sys.exit("usage: bench_chunk_best.py <query> [query ...]")
    with open(FULL) as f:
        before = json.load(f)
    rc = subprocess.call([sys.executable, os.path.join(REPO, "bench.py"), *names])
    if rc != 0:
        sys.exit(f"bench.py failed rc={rc}; BENCH_FULL.json left as bench wrote it")
    with open(FULL) as f:
        after = json.load(f)
    # bench.py already merged the chunk into BENCH_FULL.json; this tool
    # only records provenance (what the new run displaced) — it never
    # picks a historical value over the new run (r14 estimator rule).
    adjud = after.setdefault("chunk_best_adjudication", {})
    for n in names:
        adjud[n] = {
            "cold": "new run",
            "warm": "new run",
            "displaced_prior_cold": before.get("queries", {}).get(n),
            "displaced_prior_warm": before.get("queries_warm", {}).get(n),
            "displaced_prior_warm_runs": before.get("queries_warm_runs", {}).get(n),
        }
        print(n, adjud[n])
    with open(FULL, "w") as f:
        json.dump(after, f, indent=1, sort_keys=True)
    print("totals: cold", after["value"], "warm", after["warm_total"])


if __name__ == "__main__":
    main()
