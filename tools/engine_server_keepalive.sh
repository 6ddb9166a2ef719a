#!/bin/sh
# Keepalive wrapper for the resident bench-engine server.
#
# The driver's bench (bench.py) measures through the resident server when
# one is alive (see tools/engine_server.py); if the server process dies
# between this session's end and the driver's bench run, bench.py falls
# back to the in-process path whose index device upload through the axon
# tunnel (330-780 s measured, PERF.md) can blow the 540 s deadline.  This
# loop restarts the server on abnormal exit, with a short backoff so a
# hard-failing server cannot spin the host.
#
# Single-instance guard: a second invocation would start a second server
# that unlinks/rebinds the socket while the first keeps holding ~1.5 GB
# on-chip (only ONE process may hold the real chip cleanly) — an flock on
# $CACHE/keepalive.lock makes later invocations exit immediately.
#
# A clean server shutdown (rc=0, via the socket "shutdown" command) ends
# the loop; only crashes restart it.  To stop everything:
#   kill $(cat $CACHE/keepalive.pid)  (then "shutdown" the server, or
#   kill $(cat $CACHE/engine_server.pid))
#
# Usage: nohup sh tools/engine_server_keepalive.sh >> /root/bench_cache/keepalive.log 2>&1 &
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CACHE="${SNAP_TPU_BENCH_CACHE:-/root/bench_cache}"
mkdir -p "$CACHE"

LOCK="$CACHE/keepalive.lock"
exec 9> "$LOCK"
if command -v flock > /dev/null 2>&1; then
    if ! flock -n 9; then
        echo "keepalive: another instance holds $LOCK; exiting"
        exit 0
    fi
fi
echo $$ > "$CACHE/keepalive.pid"

while true; do
    echo "keepalive: starting engine server ($(date -u +%H:%M:%S))"
    python "$REPO/tools/engine_server.py" >> "$CACHE/engine_server.log" 2>&1 &
    SRV=$!
    echo $SRV > "$CACHE/engine_server.pid"
    wait $SRV
    RC=$?
    if [ "$RC" = "0" ]; then
        echo "keepalive: server exited cleanly rc=0 ($(date -u +%H:%M:%S)); not restarting"
        break
    fi
    echo "keepalive: server exited rc=$RC ($(date -u +%H:%M:%S)); restart in 20s"
    sleep 20
done
rm -f "$CACHE/keepalive.pid" "$CACHE/engine_server.pid"
