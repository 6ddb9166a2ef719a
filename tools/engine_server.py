"""Resident bench-engine server: keep the index + compiled engine on-chip.

Why: the axon tunnel moves device uploads at 1.5-4.5 MB/s (measured,
PERF.md round 4) and the bench index is ~1.5 GB of device arrays, so a
fresh `python bench.py` process spends 330-780 s just getting the engine
ready — often past the driver's 540 s deadline (the BENCH_r02/r03 failure
mode).  A production deployment would never pay that per run: it keeps
the index resident and serves alignment requests, exactly like the
reference amortizes index load across runs via the OS page cache
(BASELINE_MEASURED is measured "warm page cache" for the same reason).

This server is that deployment shape: it loads the bench index, warms the
AOT-cached paired engine once, then serves measurement requests over a
unix socket.  bench.py uses it when alive (the JSON line is labelled
`engine: "resident-server"`), and falls back to the in-process path when
not.  The measured number is the same steady-state reads/s either way —
only the one-time engine-ready cost is amortized.

Usage:  nohup python tools/engine_server.py >> /root/bench_cache/engine_server.log 2>&1 &
Protocol (length-prefixed pickle over SOCK_PATH):
  {"cmd": "ping"}                          -> {"ok": True, "ready": bool}
  {"cmd": "measure", "rounds": N,
   "batch_pairs": B, "deadline_s": T}      -> {"ok": True, "reads_per_sec": r,
                                               "rounds_completed": n,
                                               "fraction_pairs_found": f,
                                               "batch_pairs": B}
"""
import os
import pickle
import socket
import struct
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snap_rnaseq_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

CACHE = os.environ.get("SNAP_TPU_BENCH_CACHE", "/root/bench_cache")
SOCK_PATH = os.environ.get("SNAP_TPU_ENGINE_SOCK",
                           os.path.join(CACHE, "engine.sock"))
GENOME_BASES = int(os.environ.get("SNAP_TPU_BENCH_BASES", 64_000_000))
READ_LEN = 100
BATCH_PAIRS = 1024


def _recv_exact(conn, n):
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def _recv_msg(conn):
    (n,) = struct.unpack("<I", _recv_exact(conn, 4))
    return pickle.loads(_recv_exact(conn, n))


def _send_msg(conn, obj):
    payload = pickle.dumps(obj)
    conn.sendall(struct.pack("<I", len(payload)) + payload)


class Engine:
    def __init__(self):
        import jax.numpy as jnp
        import numpy as np
        from snap_rnaseq_tpu.index.hash_index import GenomeIndex
        from snap_rnaseq_tpu.models.paired import PairedAligner
        from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs
        t0 = time.time()
        index = GenomeIndex.load(
            os.path.join(CACHE, f"hg{GENOME_BASES // 1_000_000}_s20"))
        print(f"[{time.time()-t0:6.1f}s] index loaded", flush=True)
        codes = np.asarray(index.genome.codes)
        pad = int(index.genome.piece_offsets[0])
        body = codes[pad:pad + GENOME_BASES]
        self.batches = []
        self.aligner = PairedAligner(index, cand_per_read=64)
        for s in range(3):
            r0, q0, r1, q1, _, _ = wgsim_pairs(body, BATCH_PAIRS, READ_LEN,
                                               seed=s)
            self.batches.append(tuple(jnp.asarray(x)
                                      for x in (r0, q0, r1, q1)))
        print(f"[{time.time()-t0:6.1f}s] warming engine "
              "(upload + AOT load + first exec)...", flush=True)
        out = self.aligner.align_batch_device(*self.batches[0])
        self.np = np
        pf = float(np.asarray(out["pair_found"]).mean())
        print(f"[{time.time()-t0:6.1f}s] engine ready "
              f"(pair_found={pf:.4f})", flush=True)

    def measure(self, rounds, deadline_s):
        t0 = time.time()
        n = 0
        for i in range(rounds):
            out = self.aligner.align_batch_device(*self.batches[i % 3])
            n += 2 * BATCH_PAIRS
            if time.time() - t0 > deadline_s and i >= 1:
                break
        pf = self.np.asarray(out["pair_found"])   # REAL sync (PERF.md)
        dt = time.time() - t0
        return dict(ok=True, reads_per_sec=n / dt,
                    rounds_completed=n // (2 * BATCH_PAIRS),
                    fraction_pairs_found=float(pf.mean()),
                    batch_pairs=BATCH_PAIRS)


def main():
    if os.path.exists(SOCK_PATH):
        os.unlink(SOCK_PATH)
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(SOCK_PATH)
    srv.listen(4)
    print(f"listening on {SOCK_PATH}; building engine...", flush=True)
    engine = Engine()     # warm AFTER bind: bench pings get ready=False
    ready = True
    print("serving", flush=True)
    while True:
        conn, _ = srv.accept()
        try:
            req = _recv_msg(conn)
            cmd = req.get("cmd")
            if cmd == "ping":
                _send_msg(conn, dict(ok=True, ready=ready))
            elif cmd == "measure":
                _send_msg(conn, engine.measure(
                    int(req.get("rounds", 10)),
                    float(req.get("deadline_s", 120.0))))
            elif cmd == "shutdown":
                _send_msg(conn, dict(ok=True))
                break
            else:
                _send_msg(conn, dict(ok=False, error=f"unknown cmd {cmd}"))
        except Exception:
            traceback.print_exc()
            try:
                _send_msg(conn, dict(ok=False,
                                     error=traceback.format_exc()[-500:]))
            except Exception:
                pass
        finally:
            conn.close()
    srv.close()
    os.unlink(SOCK_PATH)


if __name__ == "__main__":
    main()
