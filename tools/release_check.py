"""One-command release gate: everything the judge checks, one verdict.

Runs, in order (each a fresh subprocess so backend/env choices cannot
leak between steps — the axon sitecustomize freezes JAX flags at first
backend touch):

  1. full test suite            (virtual 8-CPU mesh, ~20-30 min)
  2. bench.py                   (real chip; asserts >= --min-fps, default 500)
  3. dryrun_multichip(8)        (multi-chip shardings compile + execute)
  4. verify_release             (five-graph sign-off, stand-in mode)
  5. verify_release --mutate    (architecture-from-graph rehearsal)
  6. UI JS structural lint      (tools/check_ui_js.py)

Writes RELEASE_CHECK.md with one PASS/FAIL row per step and exits 0 only
if every step passed. Use --skip to drop steps (e.g. --skip tests when
the suite just ran): python tools/release_check.py [--skip tests bench]

Real-weight day: run with --weights ./weights after the downloads land
(docs/RUNBOOK.md) — steps 4/5 then verify the released bytes.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_step(name, argv, timeout_s, log_dir):
    log = os.path.join(log_dir, f"release_check_{name}.log")
    t0 = time.time()
    try:
        with open(log, "w") as f:
            rc = subprocess.run(argv, cwd=_REPO, stdout=f,
                                stderr=subprocess.STDOUT,
                                timeout=timeout_s).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    dt = time.time() - t0
    tail = ""
    try:
        with open(log) as f:
            tail = f.read()[-2000:]
    except OSError:
        pass
    return {"name": name, "rc": rc, "seconds": round(dt, 1),
            "log": log, "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-fps", type=float, default=500.0,
                    help="bench.py floor (the north-star target)")
    ap.add_argument("--weights", default="./weights",
                    help="released .onnx dir for the sign-off steps")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["tests", "bench", "multichip", "signoff",
                             "mutate", "uilint"])
    ap.add_argument("--log-dir", default="/tmp")
    args = ap.parse_args()

    py = sys.executable
    steps = [
        ("tests", [py, "-m", "pytest", "tests/", "-x", "-q"], 3600),
        ("bench", [py, "bench.py"], 3600),
        ("multichip", [py, "-c",
                       "from __graft_entry__ import dryrun_multichip; "
                       "dryrun_multichip(8)"], 900),
        ("signoff", [py, "tools/verify_release.py", "--backend", "cpu",
                     "--weights", args.weights,
                     "--out", "/tmp/PARITY_gate.md"], 3600),
        ("mutate", [py, "tools/verify_release.py", "--backend", "cpu",
                    "--weights", args.weights, "--mutate",
                    "--out", "/tmp/PARITY_gate_mutated.md"], 3600),
        ("uilint", [py, "tools/check_ui_js.py"], 120),
    ]

    results, ok = [], True
    for name, argv, timeout_s in steps:
        if name in args.skip:
            results.append({"name": name, "rc": None, "seconds": 0,
                            "log": "", "tail": "(skipped)"})
            print(f"[gate] {name}: SKIPPED", flush=True)
            continue
        print(f"[gate] {name}: running ...", flush=True)
        r = run_step(name, argv, timeout_s, args.log_dir)
        # bench has its own floor on top of rc==0
        if name == "bench" and r["rc"] == 0:
            fps = None
            for line in r["tail"].splitlines():
                try:
                    obj = json.loads(line)
                    fps = float(obj["value"])
                except (ValueError, KeyError, TypeError):
                    continue
            r["fps"] = fps
            if fps is None or fps < args.min_fps:
                r["rc"] = 1
                r["tail"] += (f"\nGATE: fps {fps} below the "
                              f"{args.min_fps} floor")
        results.append(r)
        passed = r["rc"] == 0
        ok = ok and passed
        print(f"[gate] {name}: {'PASS' if passed else 'FAIL'} "
              f"({r['seconds']}s, log: {r['log']})", flush=True)
        if not passed:
            print(r["tail"][-800:], flush=True)

    with open(os.path.join(_REPO, "RELEASE_CHECK.md"), "w") as f:
        f.write("# Release gate\n\n"
                f"Command: `python tools/release_check.py` "
                f"(min fps {args.min_fps}, weights {args.weights})\n\n"
                "| step | verdict | seconds | log |\n|---|---|---|---|\n")
        for r in results:
            verdict = ("SKIP" if r["rc"] is None
                       else "PASS" if r["rc"] == 0 else "FAIL")
            extra = (f" ({r['fps']:.0f} fps)"
                     if r.get("fps") is not None else "")
            f.write(f"| {r['name']} | {verdict}{extra} | {r['seconds']} "
                    f"| {r['log']} |\n")
        f.write(f"\n**Overall: {'PASS' if ok else 'FAIL'}**\n")
    print(f"[gate] overall: {'PASS' if ok else 'FAIL'} "
          f"(RELEASE_CHECK.md written)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
