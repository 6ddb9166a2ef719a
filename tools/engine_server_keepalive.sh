#!/bin/sh
# Keepalive wrapper for the resident bench-engine server.
#
# The driver's bench (bench.py) measures through the resident server when
# one is alive (see tools/engine_server.py); if the server process dies
# between this session's end and the driver's bench run, bench.py falls
# back to the in-process path whose index device upload through the axon
# tunnel (330-780 s measured, PERF.md) can blow the 540 s deadline.  This
# loop restarts the server on any exit, with a short backoff so a
# hard-failing server cannot spin the host.
#
# Usage: nohup sh tools/engine_server_keepalive.sh >> /root/bench_cache/keepalive.log 2>&1 &
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="${SNAP_TPU_BENCH_CACHE:-/root/bench_cache}"
while true; do
    echo "keepalive: starting engine server ($(date -u +%H:%M:%S))"
    python "$REPO/tools/engine_server.py" >> "$CACHE/engine_server.log" 2>&1
    echo "keepalive: server exited rc=$? ($(date -u +%H:%M:%S)); restart in 20s"
    sleep 20
done
