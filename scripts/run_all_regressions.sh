#!/bin/bash
# Full golden-trajectory regression sweep (the reference's
# regress/regression-test equivalent). Runs each scene at its golden timestep
# on the float64 CPU backend and compares L-inf error against tolerance.
#
# Usage: scripts/run_all_regressions.sh [output-dir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/moby_tpu_regress}
mkdir -p "$OUT"
GOLD=/root/reference/regress
FAIL=0

run () {
  local name=$1 tol=$2; shift 2
  echo "=== $name ==="
  python -m moby_tpu.cli.regress --cpu "$@" "$OUT/$name.out" || { FAIL=1; return; }
  python -m moby_tpu.cli.compare "$GOLD/$name.dat" "$OUT/$name.out" "$tol" || FAIL=1
}

run sphere-stack 1e-4 -mt=1 /root/reference/example/stacks/sphere-stack.xml
run sitting-box 1e-4 -s=0.001 -mt=10 scenes/sitting-box.xml
run fixed-articulated-table 1e-2 -s=0.001 -mt=10 scenes/fixed-articulated-table.xml
RIMLESS_WHEEL_THETAD=0.28920687 RIMLESS_WHEEL_START=pivot \
  run rimless-wheel 1e-2 -s=0.001 -mt=8 -p=rimless_wheel x
# golden-data provenance (scripts/cc_pendulum_dt_study.py): the .setup says
# -s=1e-4 -mt=10 but the golden has 6500 lines at 1e-3 spacing over 6.5s, and
# its pin-anchor drift at 1s (0.00264) matches first-order integration at
# dt=1e-3 (our drift = 2.55*dt: 0.00255 @1e-3, 0.00026 @1e-4, converging
# O(dt) to the exact constraint). The golden is therefore a dt=1e-3 artifact;
# comparing at matched dt=1e-3 gives L-inf 6.5e-4 at 1s / 0.023 at 6.5s
# (accumulated golden-side sag phase), while simulating MORE accurately at
# the setup's 1e-4 *increases* the apparent error (2.2e-3 at 1s) because the
# golden itself carries the dt=1e-3 sag.
run contact-constrained-pendulum 2.5e-2 -s=0.001 -mt=6.5 -p=cc_pendulum x

if [ $FAIL -eq 0 ]; then echo "ALL REGRESSIONS PASS"; else echo "FAILURES"; fi
exit $FAIL
