"""Tiny client for the resident engine server (tools/engine_server.py).

Usage:
  python tools/engine_client.py ping
  python tools/engine_client.py measure [rounds]
  python tools/engine_client.py measure_se [rounds]
  python tools/engine_client.py reload [rounds] [k=v ...]   # dev A/B
  python tools/engine_client.py reload_se [rounds] [k=v ...]
  python tools/engine_client.py profile [steps] [single=true] [bp=N]
  python tools/engine_client.py shutdown

Special k=v keys consumed by the client (not passed as aligner config):
  bp=N   batch_pairs for the measurement/profile batches.

reload re-imports the engine modules inside the server and measures the
CURRENT on-disk code against the resident device arrays — the round-5 A/B
loop (one trace+compile per edit, no 480 s index re-upload).  k=v pairs
become aligner config overrides (ints/floats/bools parsed).
"""
import json
import os
import pickle
import socket
import struct
import sys

CACHE = os.environ.get("SNAP_TPU_BENCH_CACHE", "/root/bench_cache")
SOCK = os.environ.get("SNAP_TPU_ENGINE_SOCK",
                      os.path.join(CACHE, "engine.sock"))


def call(obj, timeout=3600.0):
    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    conn.settimeout(timeout)
    conn.connect(SOCK)
    payload = pickle.dumps(obj)
    conn.sendall(struct.pack("<I", len(payload)) + payload)
    buf = b""
    while len(buf) < 4:
        buf += conn.recv(4 - len(buf))
    (n,) = struct.unpack("<I", buf)
    data = b""
    while len(data) < n:
        chunk = conn.recv(n - len(data))
        if not chunk:
            raise ConnectionError("peer closed")
        data += chunk
    conn.close()
    return pickle.loads(data)


def parse_val(v):
    if v in ("True", "true"):
        return True
    if v in ("False", "false"):
        return False
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "ping"
    args = sys.argv[2:]
    rounds = 20
    kw = {}
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            kw[k] = parse_val(v)
        else:
            rounds = int(a)
    bp = kw.pop("bp", 1024)
    if cmd == "ping":
        req = {"cmd": "ping"}
    elif cmd in ("measure", "measure_se"):
        req = {"cmd": cmd, "rounds": rounds, "deadline_s": 300.0,
               "batch_pairs": bp}
    elif cmd in ("reload", "reload_se"):
        req = {"cmd": "reload_measure", "kw": kw,
               "single": cmd == "reload_se", "rounds": rounds,
               "batch_pairs": bp}
    elif cmd == "profile":
        req = {"cmd": "profile", "steps": rounds if rounds != 20 else 4,
               "single": bool(kw.pop("single", False)), "batch_pairs": bp}
    elif cmd == "shutdown":
        req = {"cmd": "shutdown"}
    else:
        raise SystemExit(f"unknown cmd {cmd}")
    out = call(req)
    print(json.dumps(out, default=str), flush=True)
    if cmd == "profile" and out.get("ok"):
        # parse the xplane client-side (same filesystem)
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tools.xprof_dump import collect_xplane
        per_op = collect_xplane(out["logdir"])
        n = out["steps"]
        total_ms = sum(per_op.values()) / 1e6
        print(f"total device self-time: {total_ms / n:.1f} ms/batch "
              f"({(1 if req['single'] else 2) * out['batch_pairs'] * n / (total_ms / 1e3):,.0f} reads/s device-bound)")
        import re
        from collections import defaultdict
        rollup = defaultdict(float)
        for name, ns in per_op.items():
            rollup[re.split(r"[.\d]", name, 1)[0]] += ns
        print("per-category (ms/batch):")
        for cat, ns in sorted(rollup.items(), key=lambda kv: -kv[1])[:14]:
            print(f"  {ns / 1e6 / n:8.2f}  {cat}")
        print("top 40 ops (ms/batch):")
        for name, ns in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {ns / 1e6 / n:8.3f}  {name}")


if __name__ == "__main__":
    main()
