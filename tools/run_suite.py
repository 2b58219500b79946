"""Full-suite runner with per-file process isolation + crash retry.

Motivation (round 5): one monolithic `pytest tests/` run intermittently
dies with a SIGSEGV inside jaxlib's persistent-compilation-cache write
(`put_executable_and_time -> executable.serialize()`) after ~15-40 min of
sustained CPU compiles — the crashing test passes in isolation, and the
race killed two full-suite attempts this round.  Running one pytest
process per test file bounds the blast radius; a signal-killed file is
retried once (its compiles are then persistent-cache hits).

Usage: python tools/run_suite.py  (from the repo root; ~20-40 min warm)
Exit 0 iff every file ends green."""
import glob
import re
import subprocess
import sys
import time

t0 = time.time()
total_pass = total_fail = 0
bad = []
files = sorted(glob.glob("tests/test_*.py"))
for f in files:
    for attempt in (1, 2):
        t1 = time.time()
        r = subprocess.run([sys.executable, "-m", "pytest", f, "-q",
                            "--no-header"], capture_output=True, text=True)
        out = r.stdout.strip().splitlines()
        tail = out[-1] if out else ""
        m_pass = re.search(r"(\d+) passed", tail)
        m_fail = re.search(r"(\d+) failed", tail)
        crashed = r.returncode < 0 or r.returncode >= 128
        print(f"{f:36s} {tail[:70]:72s} [{time.time()-t1:5.1f}s]"
              + (f" rc={r.returncode}" if r.returncode else ""),
              flush=True)
        if crashed and attempt == 1:
            print(f"  -> signal {r.returncode}; retrying {f}", flush=True)
            continue
        total_pass += int(m_pass.group(1)) if m_pass else 0
        total_fail += int(m_fail.group(1)) if m_fail else 0
        if r.returncode != 0:
            bad.append(f)
        break

dt = time.time() - t0
print(f"\nSUITE: {total_pass} passed, {total_fail} failed, "
      f"{len(bad)} bad files {bad} in {dt/60:.1f} min")
sys.exit(1 if bad else 0)
