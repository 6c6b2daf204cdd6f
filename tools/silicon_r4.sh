#!/bin/bash
# Round-4 silicon queue: the round-3 backlog (never executed — the relay was
# down for that round's window) plus the round-4 capability rows (matrix /
# semiglobal / infix on the band kernel).  Stages are independently
# timeout-guarded and logged under /tmp/silicon_r4; ordered gate -> headline
# -> sweeps -> new modes -> op account -> tuners (most important first).
#
#   bash tools/silicon_r4.sh [quick]
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
OUT=/tmp/silicon_r4
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

B=/root/reference/bdna

# 1) on-silicon gate
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
  --check golden --tsv "$OUT/sizes-nw-v5e1.tsv" \
  --json "$OUT/sizes-nw-v5e1.json"
run sweep_nw_band 2400 python -m tpualign bench \
  --pairs 2gb,4gb,8gb,16gb,24gb,32gb,48gb,64gb --impl band \
  --match 2 --mismatch -3 --gap -4 --check native \
  --tsv "$OUT/sizes-nw-band-v5e1.tsv" \
  --json "$OUT/sizes-nw-band-v5e1.json"
run sweep_sw 2400 python -m tpualign bench \
  --pairs 2gb,4gb,8gb,16gb,24gb,32gb,48gb,64gb --impl band --mode sw \
  --match 3 --mismatch -2 --gap -1 --check native \
  --tsv "$OUT/sizes-sw-v5e1.tsv" \
  --json "$OUT/sizes-sw-v5e1.json"

# 5) round-4 capability rows: matrix + ends-free on the band kernel,
#    native-verified (the reference has none of these modes)
run sweep_matrix 1800 python -m tpualign bench \
  --pairs 16gb,64gb --impl band --matrix dna:2,-1,-3 --gap -2 \
  --check native --tsv "$OUT/sizes-matrix-v5e1.tsv" \
  --json "$OUT/sizes-matrix-v5e1.json"
run sweep_sg 1800 python -m tpualign bench \
  --pairs 16gb,64gb --impl band --mode sg --match 2 --mismatch -1 \
  --gap -2 --check native --tsv "$OUT/sizes-sg-v5e1.tsv" \
  --json "$OUT/sizes-sg-v5e1.json"
run sweep_infix 1800 python -m tpualign bench \
  --pairs 16gb,64gb --impl band --mode infix --match 2 --mismatch -1 \
  --gap -2 --check native --tsv "$OUT/sizes-infix-v5e1.tsv" \
  --json "$OUT/sizes-infix-v5e1.json"
run sweep_sg_matrix 1800 python -m tpualign bench \
  --pairs 64gb --impl band --mode sg --matrix dna:2,-1,-3 --gap -2 \
  --check native --tsv "$OUT/sizes-sg-matrix-v5e1.tsv" \
  --json "$OUT/sizes-sg-matrix-v5e1.json"

# 6) flagship op account (base vs lean schedules + ablations)
run op_account 1800 python tools/op_account.py

if [ "$QUICK" != quick ]; then
  # 7) band strip-depth tuners (rows > 112 may beat the current default)
  run tune_band 2400 python -m tpualign tune --engine band \
    --values 64,96,112,128,160,192 --match 2 --mismatch -3 --gap -4 \
    --tsv "$OUT/tune-band-v5e1.tsv" "$B/64gb-1.bdna" "$B/64gb-2.bdna"
  run tune_band_chunked 2400 python -m tpualign tune --engine band-chunked \
    --values 96,112,128 --blocks 65536,131072 --match 2 --mismatch -3 \
    --gap -4 --tsv "$OUT/tune-band-chunked-v5e1.tsv" \
    "$B/64gb-1.bdna" "$B/64gb-2.bdna"
fi

echo "=== silicon queue done ($(date +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
