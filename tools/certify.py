"""One-command end-of-round certification — the discipline VERDICT r4
asked for ("keep the extended set certified"), automated so a round
cannot silently skip it.

Runs SEQUENTIALLY (never two Spark JVMs — local-mode contention
fabricates 2-3x regressions, docs/SCALE.md):

1. full pytest suite,
2. the DuckDB oracle gate over EVERY registered query at sf0.001,
3. the same at sf0.01 (the driver's grading scale),
4. bench.py at $SPARK_GRAFT_SF_DIR (default sf0.1),

then prints ONE JSON line with the four outcomes. Exit 0 only if all
four pass (bench "passes" when it emits valid JSON with an empty
superlinear list). Use --skip-tests to re-certify queries only.

    python tools/certify.py [--skip-tests]
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(cmd: list[str]) -> tuple[int, str]:
    p = subprocess.run(
        cmd, cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
    )
    return p.returncode, p.stdout


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    report: dict = {}
    ok = True

    if "--skip-tests" not in argv:
        rc, out = _run([sys.executable, "-m", "pytest", "tests/", "-q"])
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        report["pytest"] = tail
        ok &= rc == 0 and " passed" in tail and "failed" not in tail
    else:
        report["pytest"] = "skipped"

    for sf in ("sf0.001", "sf0.01"):
        rc, out = _run(
            [sys.executable, "tools/check_oracle.py", f"/root/testdata/{sf}"]
        )
        m = re.search(r"(\d+) failures", out)
        n_fail = int(m.group(1)) if m else -1
        n_ok = len(re.findall(r"^ok ", out, re.M))
        report[f"oracle_{sf}"] = {"ok": n_ok, "failures": n_fail}
        ok &= rc == 0 and n_fail == 0

    rc, out = _run([sys.executable, "bench.py"])
    bench = None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            bench = json.loads(line)
    if bench is None or rc != 0:
        report["bench"] = "FAILED"
        ok = False
    else:
        report["bench"] = {
            "total_s": bench["value"],
            "sf": bench["sf"],
            "superlinear": bench.get("superlinear", []),
        }
        ok &= not bench.get("superlinear")

    report["certified"] = ok
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
