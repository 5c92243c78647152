"""Unattended hardware-evidence collection for a returning TPU relay.

The relay to the single v5e can be down for hours (two rounds lost
measurements to outages near snapshot time). This runner executes the full
measurement protocol in one shot, appends every JSON result line to
`docs/hw_evidence.jsonl` with a step name and return code, and keeps going
on per-step failure — so one invocation after the relay returns captures
the round's evidence even if some steps flake.

  nohup python scripts/hw_evidence.py > /tmp/hw_evidence.log 2>&1 &

Order matters: the kernel canaries run first (persisting the gate
markers), then the benches that depend on them.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "hw_evidence.jsonl")

STEPS = [
    # (name, argv, timeout_s)
    ("kernel_canaries",
     [sys.executable, "-c",
      "from vsc22_tpu.ops.kernel_gate import validate_and_enable;"
      "import json;print(json.dumps({'gate_open': validate_and_enable()}))"],
     3600),
    ("bench_pass1", [sys.executable, "bench.py"], 7200),
    ("bench_pass2", [sys.executable, "bench.py"], 3600),
    ("perf_hrnet", [sys.executable, "scripts/perf_hrnet.py"], 3600),
    ("perf_matching",
     [sys.executable, "scripts/perf_matching.py", "--profile"], 3600),
    ("perf_models", [sys.executable, "scripts/perf_models.py"], 3600),
    ("perf_train_swin_fgm",
     [sys.executable, "scripts/perf_train.py", "--model", "swin",
      "--batch", "100", "--fgm", "--remat"], 5400),
    ("scaled_eval",
     [sys.executable, "scripts/scaled_eval.py"], 14400),
]


def relay_up() -> bool:
    try:
        with socket.create_connection(("127.0.0.1", 8083), timeout=5):
            return True
    except OSError:
        return False


def record(step: str, rc, seconds: float, lines):
    entry = {
        "step": step,
        "rc": rc,
        "wall_s": round(seconds, 1),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    # Keep any JSON lines the step printed (bench/perf scripts print one).
    parsed = []
    for ln in lines:
        ln = ln.strip()
        if ln.startswith("{") and ln.endswith("}"):
            try:
                parsed.append(json.loads(ln))
            except ValueError:
                pass
    if parsed:
        entry["results"] = parsed
    else:
        entry["tail"] = [ln for ln in lines[-5:]]
    with open(OUT, "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(f"[hw_evidence] {step}: rc={rc} {entry.get('results', '')}",
          flush=True)


def main():
    wait = int(os.environ.get("VSC22_EVIDENCE_RELAY_WAIT_SECS", "0"))
    deadline = time.monotonic() + wait
    while not relay_up():
        if time.monotonic() >= deadline:
            print("[hw_evidence] relay down; aborting (set "
                  "VSC22_EVIDENCE_RELAY_WAIT_SECS to poll)", flush=True)
            record("relay_probe", 2, 0.0, ["relay down"])
            return 2
        time.sleep(30)

    only = sys.argv[1:]  # optional step-name filter
    for name, argv, timeout in STEPS:
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                argv, cwd=ROOT, timeout=timeout,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            rc, out = proc.returncode, proc.stdout.splitlines()
        except subprocess.TimeoutExpired as e:
            rc = "timeout"
            out = (e.stdout or "").splitlines() if e.stdout else []
        record(name, rc, time.monotonic() - t0, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
