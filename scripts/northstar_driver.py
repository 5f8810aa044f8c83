"""Health-gated retry loop for the north-star pipeline on the relayed TPU.

The relay's worker process intermittently dies 10-20 minutes into
dispatch-heavy sessions ("TPU worker process crashed or restarted") and
takes ~15-25 minutes to come back.  This driver runs the remaining
million_point_tune_fit.py phases one subprocess each, gated on a cheap
chip-health probe, and retries a crashed phase after waiting out the
recovery window.  Phase idempotence (precond.npz / weights.npy /
result.json markers in the state dir) means a retry resumes at the
stage that failed rather than from the top.

    python scripts/northstar_driver.py --phases fit verify

Exit code 0 iff every requested phase completed.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEALTH_PROBE = """
import jax, time
import jax.numpy as jnp
t0 = time.time()
x = jnp.full((512, 512), 0.5, jnp.float32)
v = float(jnp.sum(x @ x))
print(f"probe ok {v:.1f} in {time.time()-t0:.1f}s", flush=True)
"""


def log(msg):
    print(f"[driver {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def chip_healthy(timeout=240):
    try:
        r = subprocess.run([sys.executable, "-c", HEALTH_PROBE],
                           timeout=timeout, capture_output=True,
                           text=True, cwd=REPO)
        if r.returncode == 0:
            log(f"health probe: {r.stdout.strip().splitlines()[-1]}")
            return True
        log(f"health probe failed rc={r.returncode}: "
            f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''}")
        return False
    except subprocess.TimeoutExpired:
        log(f"health probe timed out after {timeout}s")
        return False


def phase_done(state_dir, phase):
    try:
        with open(os.path.join(state_dir, "result.json")) as fh:
            result = json.load(fh)
    except (OSError, ValueError):
        result = {}
    markers = {"data": lambda r: os.path.exists(
                   os.path.join(state_dir, "x.npy")),
               "tune": lambda r: r.get("tuned_hyperparams") is not None,
               "warm": lambda r: r.get("warm_sec") is not None,
               "fit": lambda r: r.get("train_sample_rmse") is not None,
               "verify": lambda r: r.get("nmll_rel_delta") is not None,
               "slq": lambda r: r.get("slq_verify_nmll") is not None,
               "slq64": lambda r: r.get("slq64_nmll") is not None,
               "verify64": lambda r:
                   r.get("exact_method") == "host_fp64" and
                   r.get("nmll_rel_delta") is not None}
    return markers[phase](result)


def run_phase(phase, args, extra=()):
    cmd = [sys.executable, "scripts/million_point_tune_fit.py",
           "--phase", phase, "--state-dir", args.state_dir,
           "--profile", args.profile,
           "--heldout", str(args.heldout),
           "--dim", str(args.dim)]
    if args.verify_rffs:
        cmd.extend(["--verify-rffs", str(args.verify_rffs)])
    if args.out:
        cmd.extend(["--out", args.out])
    if args.stacked:
        cmd.append("--stacked")
    cmd.extend(extra)
    log(f"running: {' '.join(cmd)} (timeout {args.phase_timeout}s)")
    t0 = time.time()
    try:
        r = subprocess.run(cmd, timeout=args.phase_timeout, cwd=REPO)
        log(f"phase {phase} exited rc={r.returncode} "
            f"after {time.time()-t0:.0f}s")
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        log(f"phase {phase} TIMED OUT after {time.time()-t0:.0f}s")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", nargs="+",
                    default=["data", "tune", "fit", "verify"])
    ap.add_argument("--state-dir", default="/tmp/northstar_state")
    ap.add_argument("--profile", default="windows")
    ap.add_argument("--heldout", type=int, default=0)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--verify-rffs", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="artifact path forwarded to the verify phases")
    ap.add_argument("--stacked", action="store_true", default=True)
    ap.add_argument("--max-attempts", type=int, default=10,
                    help="per phase")
    ap.add_argument("--phase-timeout", type=int, default=7200)
    ap.add_argument("--recovery-sleep", type=int, default=600)
    ap.add_argument("--fallback-after", type=int, default=3,
                    help="switch CG to --looped-cg (small per-iteration "
                         "dispatches instead of one big fused compile) "
                         "after this many failed attempts of a phase")
    args = ap.parse_args()

    for phase in args.phases:
        if phase_done(args.state_dir, phase):
            log(f"phase {phase}: already complete, skipping")
            continue
        extra = []
        for attempt in range(1, args.max_attempts + 1):
            if attempt == args.fallback_after + 1 and \
                    phase in ("warm", "fit", "verify", "slq") and not extra:
                log(f"phase {phase}: {args.fallback_after} fused "
                    "attempts failed; falling back to --looped-cg")
                extra = ["--looped-cg"]
            while not chip_healthy():
                log(f"chip unhealthy; sleeping {args.recovery_sleep}s")
                time.sleep(args.recovery_sleep)
            log(f"phase {phase}: attempt {attempt}/{args.max_attempts}")
            ok = run_phase(phase, args, extra)
            if ok and phase_done(args.state_dir, phase):
                log(f"phase {phase}: COMPLETE")
                break
            log(f"phase {phase}: attempt {attempt} failed; "
                f"sleeping {args.recovery_sleep}s before retry")
            time.sleep(args.recovery_sleep)
        else:
            log(f"phase {phase}: exhausted {args.max_attempts} attempts; "
                "aborting")
            return 1
    log("all requested phases complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
