"""Assemble CORRECTNESS_SF1.json from the round-5 sf1 runs.

The round-5 single-session full-registry run at sf1 (local[16], build
8370843) was killed by a sandbox restart after 78/85 queries — every one
green ("ok ... rows match" means rows+schema+hash all matched and
spark_rows == oracle_rows; see scripts/check_oracles.py:129). The raw log
is committed at BENCH/sf1_session_run.log. The remaining 7 queries were
re-run immediately afterwards on the IDENTICAL build (no code commits in
between) via the same gate script with CHECK_ORACLES_JSON set.

This script parses the session log plus the follow-up JSONs and writes a
single 85-row board with a note that states exactly which rows came from
which run.
"""

from __future__ import annotations

import json
import re
import sys

LOG = "BENCH/sf1_session_run.log"
FOLLOWUPS = ["/tmp/sf1_rem6.json", "/tmp/sf1_ngram.json"]
OUT = "CORRECTNESS_SF1.json"

results: dict[str, dict] = {}
for m in re.finditer(
    r"ok   (q_[a-z_0-9]+): (\d+) rows match \(([0-9.]+)s\)", open(LOG).read()
):
    name, rows, secs = m.group(1), int(m.group(2)), float(m.group(3))
    results[name] = {
        "rows_match": True, "schema_match": True, "hash_match": True,
        "spark_rows": rows, "oracle_rows": rows, "secs": secs, "err": None,
        "run": "session",
    }
n_session = len(results)

for path in FOLLOWUPS:
    try:
        d = json.load(open(path))
    except FileNotFoundError:
        print(f"skip {path} (not found)")
        continue
    for name, row in d["results"].items():
        assert name not in results, f"duplicate row {name}"
        results[name] = {**row, "run": "followup"}

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402

registry = list(E.queries())
missing = [q for q in registry if q not in results]
extra = [q for q in results if q not in registry]
assert not extra, extra
bad = [q for q, r in results.items()
       if not (r["rows_match"] and r["schema_match"] and r["hash_match"])]

note = (
    f"{len(results)}-query sf1 board, build 8370843: {n_session} queries from "
    "one coherent single-session full-registry run (raw log committed at "
    "BENCH/sf1_session_run.log; the session was killed by a sandbox restart "
    f"at 78/85) + {len(results) - n_session} remaining queries re-run "
    "immediately after on the identical build via the same gate "
    "(scripts/check_oracles.py, local[16]). 'run' field marks provenance."
)
if missing:
    note += f" STILL MISSING: {missing}."

json.dump(
    {"sf_dir": "testdata/sf1", "master": "local[16]", "note": note,
     "results": {q: results[q] for q in registry if q in results}},
    open(OUT, "w"), indent=1,
)
print(f"{len(results)}/{len(registry)} rows ({n_session} session + "
      f"{len(results) - n_session} followup); bad={bad}; missing={missing}")
