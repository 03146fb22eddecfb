#!/bin/bash
# Control-gated bench protocol (VERDICT r7 "Next round" #1): this host's
# storage regime swings 3-10x between windows (SCALE.md r5-r7), so a bench
# sweep is only comparable when the ref_tiny_datagen I/O control is calm
# on BOTH sides of it. This wrapper
#
#   1. probes the control alone (SPARK_GRAFT_CONTROL_ONLY=1, ~30 s);
#      retries up to $TRIES times with a backoff when the window is
#      degraded instead of wasting a 300+ s sweep on it;
#   2. runs the full sweep once the probe is calm;
#   3. reads the sweep's own start/end control bracket (the "control"
#      object Bench now emits) and prints ACCEPT or REJECT.
#
# Usage: scripts/bench_gated.sh <out.json> [sfDir] [cpus]
#   CALM_MAX   calm acceptance bound in seconds (default 7.9 = 1.5 x 5.3)
#   TRIES      probe attempts before giving up          (default 6)
#   BACKOFF    seconds to sleep between degraded probes (default 120)
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:?usage: bench_gated.sh <out.json> [sfDir] [cpus]}
SF=${2:-/root/testdata/sf0.1}
CPUS=${3:-32}
CALM_MAX=${CALM_MAX:-7.9}
TRIES=${TRIES:-6}
BACKOFF=${BACKOFF:-120}

control_of() { # read a metric out of bench_out.json
  python3 - "$1" <<'EOF'
import json, sys
d = json.load(open("bench_out.json"))
path = sys.argv[1].split(".")
for p in path:
    d = d.get(p, {}) if isinstance(d, dict) else {}
print(d if not isinstance(d, dict) else -1)
EOF
}

for attempt in $(seq 1 "$TRIES"); do
  echo "[bench_gated] probe $attempt/$TRIES ..."
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_CONTROL_ONLY=1 \
    sbt -batch "runMain graft.Bench" >/tmp/bench_gated_probe.log 2>&1
  probe=$(control_of queries.ref_tiny_datagen)
  echo "[bench_gated] control probe: ${probe}s (calm bound ${CALM_MAX}s)"
  if python3 -c "import sys; sys.exit(0 if 0 < $probe <= $CALM_MAX else 1)"; then
    break
  fi
  if [ "$attempt" = "$TRIES" ]; then
    echo "[bench_gated] GIVING UP: no calm window in $TRIES probes"; exit 2
  fi
  sleep "$BACKOFF"
done

echo "[bench_gated] window calm — running full sweep ..."
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" >/tmp/bench_gated_sweep.log 2>&1
rc=$?
cp bench_out.json "$OUT"
start=$(control_of control.start_s)
end=$(control_of control.end_s)
ok=$(control_of control.ok)
total=$(control_of value)
echo "[bench_gated] sweep rc=$rc total=${total}s control start=${start}s end=${end}s ok=$ok -> $OUT"
if [ "$ok" = "True" ] || [ "$ok" = "true" ]; then
  echo "[bench_gated] ACCEPT"
else
  echo "[bench_gated] REJECT (re-run in a calmer window)"; exit 3
fi
