#!/bin/bash
# Watch the axon relay and fire the round-3 silicon queue the moment the
# tunnel returns.  The relay (PALLAS_AXON_POOL_IPS, port 8083) died mid-round;
# every silicon stage (tests_tpu, headline bench, sweeps, tuners) is queued
# in tools/silicon_r3.sh — this watcher polls once a minute and hands off.
#
#   bash tools/relay_watch.sh [max_minutes] [quick]
#
# Exits 0 after the queue runs, 3 if the relay never came back.
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
MAX_MIN="${1:-600}"
MODE="${2:-}"

for ((i = 0; i < MAX_MIN; i++)); do
  if probe_relay; then
    echo "relay BACK at $(date '+%H:%M:%S') after ${i} min - running queue"
    # give the tunnel a moment to finish coming up, then re-probe
    sleep 10
    if probe_relay; then
      bash tools/silicon_r3.sh $MODE
      exit $?
    fi
    echo "relay flapped - resuming watch"
  fi
  sleep 60
done
echo "relay never returned within ${MAX_MIN} min"
exit 3
