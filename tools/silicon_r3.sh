#!/bin/bash
# Round-3 silicon queue: run top-to-bottom when the axon relay is back.
# Each stage is independently timeout-guarded and logged under /tmp/silicon_r3
# so one hang cannot eat the chip window; stages are ordered gate -> headline
# -> sweeps -> tuners -> microbench (most important first).
#
#   bash tools/silicon_r3.sh [quick]
#
# "quick" skips the 2.5M large-scale rows and the tuners.
set -u
probe_relay() { # mirrors tpualign.utils.platform.tpu_reachable
  local ip="${PALLAS_AXON_POOL_IPS%%,*}"
  [ -z "$ip" ] && return 0  # no tunnel configured: local backend
  for port in 8083 8082; do
    timeout 5 bash -c "echo > /dev/tcp/$ip/$port" 2>/dev/null && return 0
  done
  return 1
}
cd "$(dirname "$0")/.."
OUT=/tmp/silicon_r3
mkdir -p "$OUT"
QUICK="${1:-}"

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"
  shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | sed 's/^/    /'
  return 0
}

# 0) relay probe: refuse to start a doomed queue
if ! probe_relay; then
  echo "relay DOWN - aborting silicon queue" >&2
  exit 2
fi

# 1) on-silicon gate (21 tests incl. the lean/base A/B + affine)
run tests_tpu 3000 python -m pytest tests_tpu/ -q

# 2) headline + A/B + chunked-band large-scale rows
if [ "$QUICK" = quick ]; then
  run bench_large 2400 python tools/bench_large_r3.py --quick
else
  run bench_large 5400 python tools/bench_large_r3.py
fi

# 3) headline bench.py (the driver's own surface)
run bench_py 900 python bench.py

# 4) size sweeps under the unified recipe (refresh the results TSVs)
run sweep_nw 2400 python -m tpualign bench \
  --pairs 2gb,4gb,8gb,16gb,24gb,32gb,48gb,64gb --impl bitpal \
  --check golden --tsv /tmp/silicon_r3/sizes-nw-v5e1.tsv \
  --json /tmp/silicon_r3/sizes-nw-v5e1.json
run sweep_nw_band 2400 python -m tpualign bench \
  --pairs 2gb,4gb,8gb,16gb,24gb,32gb,48gb,64gb --impl band \
  --match 2 --mismatch -3 --gap -4 --check native \
  --tsv /tmp/silicon_r3/sizes-nw-band-v5e1.tsv \
  --json /tmp/silicon_r3/sizes-nw-band-v5e1.json
run sweep_sw 2400 python -m tpualign bench \
  --pairs 2gb,4gb,8gb,16gb,24gb,32gb,48gb,64gb --impl band --mode sw \
  --match 3 --mismatch -2 --gap -1 --check native \
  --tsv /tmp/silicon_r3/sizes-sw-v5e1.tsv \
  --json /tmp/silicon_r3/sizes-sw-v5e1.json

# 5) flagship op account (base vs lean schedules + ablations)
run op_account 1800 python tools/op_account.py

if [ "$QUICK" != quick ]; then
  # 6) band strip-depth tuners (rows > 112 may beat the current default)
  B=/root/reference/bdna
  run tune_band 2400 python -m tpualign tune --engine band \
    --values 64,96,112,128,160,192 --match 2 --mismatch -3 --gap -4 \
    --tsv /tmp/silicon_r3/tune-band-v5e1.tsv "$B/64gb-1.bdna" "$B/64gb-2.bdna"
  run tune_band_chunked 2400 python -m tpualign tune --engine band-chunked \
    --values 96,112,128 --blocks 65536,131072 --match 2 --mismatch -3 \
    --gap -4 --tsv /tmp/silicon_r3/tune-band-chunked-v5e1.tsv \
    "$B/64gb-1.bdna" "$B/64gb-2.bdna"
fi

echo "=== silicon queue done ($(date +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
