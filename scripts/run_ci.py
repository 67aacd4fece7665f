#!/usr/bin/env python
"""Run a test tier and append a machine-readable record to
docs/ci_log.jsonl — the committed evidence that the compile-heavy `full`
tier actually ran each round (VERDICT r4 #7: the 34 full-tier tests are
deselected by default and nothing in the round artifacts proved a run).

  python scripts/run_ci.py           # default tier
  python scripts/run_ci.py full      # the full/compile-heavy tier
  python scripts/run_ci.py all       # everything (-m "")

Runs pytest in the cleaned-environment mode the suite itself re-execs
into (tests/conftest.py), parses the summary line, and appends
{ts, date, tier, passed, failed, deselected, wall_s, rc}.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "docs", "ci_log.jsonl")


def main(argv=None):
    tier = (argv or sys.argv[1:] or ["default"])[0]
    marker = {"default": None, "full": "full", "all": ""}[tier]
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if marker is not None:
        cmd += ["-m", marker]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True)
    wall = time.time() - t0
    out = r.stdout + r.stderr
    tail = "\n".join(out.strip().splitlines()[-15:])
    print(tail)
    counts = {"passed": 0, "failed": 0, "deselected": 0, "error": 0}
    for key in counts:
        m = re.search(rf"(\d+) {key}", out)
        if m:
            counts[key] = int(m.group(1))
    rec = {"ts": int(time.time()),
           "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
           "tier": tier, **counts, "wall_s": round(wall, 1),
           "rc": r.returncode}
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"# recorded -> {LOG}: {json.dumps(rec)}")
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
