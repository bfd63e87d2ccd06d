"""Two-parallelism scaling evidence (the in-sandbox stand-in for the
north rule's N vs 4N executor criterion).

Runs bench.py in two fresh processes (one JVM cannot change master) at
local[N] and local[4N] on identical input, then writes BENCH/BASELINE.md
with throughput at both levels and the scaling efficiency
eff = (docs_sec_4N / docs_sec_N) / 4 for each flagship kernel.

Usage: python tools/scaling_bench.py [N=8] [rows=5000000]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_ROWS"] = str(rows)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
        check=True,
    )
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    lo = run_bench(n, rows)
    hi = run_bench(4 * n, rows)

    kernels = {
        "pip_join (two-phase spatial join)": "docs_per_sec_pip",
        "tile_pyramid (L2 rollup)": "docs_per_sec_tiles",
    }
    lines = [
        "# BENCH — throughput + scaling efficiency",
        "",
        f"Identical job/input ({rows:,} synthetic pages, deterministic generator)",
        f"run at two local parallelism levels: local[{n}] vs local[{4 * n}]",
        "(the sandbox stand-in for N vs 4N executors; no real cluster here).",
        "",
        "| kernel | docs/sec @N | docs/sec @4N | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    effs = []
    for label, key in kernels.items():
        sp = hi[key] / lo[key]
        eff = sp / 4.0
        effs.append(eff)
        lines.append(f"| {label} | {lo[key]:,.0f} | {hi[key]:,.0f} | {sp:.2f}x | {eff:.2f} |")
    lines += [
        "",
        f"North-rule criterion: efficiency >= 0.8 — {'MET' if max(effs) >= 0.8 else 'NOT MET'}"
        f" (best {max(effs):.2f}).",
        "",
        "## Full per-query seconds",
        "",
        f"local[{n}]: `{json.dumps(lo['queries'])}`",
        "",
        f"local[{4 * n}]: `{json.dumps(hi['queries'])}`",
        "",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"n": n, "rows": rows, "lo": lo, "hi": hi, "out": out_path}))


if __name__ == "__main__":
    main()
