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
AOT-cached paired + single engines once, then serves measurement requests
over a unix socket.  bench.py uses it when alive (the JSON line is
labelled `engine: "resident-server"`), and falls back to the in-process
path when not.  The measured number is the same steady-state reads/s
either way — only the one-time engine-ready cost is amortized; ping
reports those cold costs so they stay visible next to the steady-state
number (ADVICE r4).

Usage:  nohup python tools/engine_server.py >> /root/bench_cache/engine_server.log 2>&1 &
Protocol (length-prefixed pickle over SOCK_PATH):
  {"cmd": "ping"}                          -> {"ok": True, "ready": bool,
                                               "cold_costs": {...}}
  {"cmd": "measure", "rounds": N,
   "deadline_s": T}                        -> {"ok": True, "reads_per_sec": r,
                                               "rounds_completed": n,
                                               "fraction_pairs_found": f,
                                               "batch_pairs": B}
  {"cmd": "measure_se", ...}               -> same for the single-end engine
  {"cmd": "reload_measure", "kw": {...},
   "single": bool, "rounds": N}            -> dev harness: re-import the
       engine modules from disk, rebuild the aligner REUSING the resident
       device arrays (no re-upload), jit + measure.  This is the round-5
       A/B loop: an engine-code edit costs one trace+compile instead of
       trace+compile+480s index upload.
  {"cmd": "shutdown"}                      -> clean exit (keepalive stops)
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
        from snap_rnaseq_tpu.models.single import (SingleAligner,
                                                   SingleAlignerConfig)
        from snap_rnaseq_tpu.utils.synth_genome import wgsim_pairs
        t0 = time.time()
        self.cold = {}
        index = GenomeIndex.load(
            os.path.join(CACHE, f"hg{GENOME_BASES // 1_000_000}_s20"))
        self.index = index
        self.cold["index_load_s"] = round(time.time() - t0, 1)
        print(f"[{time.time()-t0:6.1f}s] index loaded", flush=True)
        codes = np.asarray(index.genome.codes)
        pad = int(index.genome.piece_offsets[0])
        self.body = codes[pad:pad + GENOME_BASES]
        self._wgsim_pairs = wgsim_pairs
        self._jnp = jnp
        self._batch_cache = {}
        t1 = time.time()
        self.aligner = PairedAligner(index, cand_per_read=64)
        self.batches = self._get_batches(BATCH_PAIRS)
        print(f"[{time.time()-t0:6.1f}s] warming paired engine "
              "(upload + AOT load + first exec)...", flush=True)
        out = self.aligner.align_batch_device(*self.batches[0])
        self.np = np
        pf = float(np.asarray(out["pair_found"]).mean())
        self.cold["paired_ready_s"] = round(time.time() - t1, 1)
        print(f"[{time.time()-t0:6.1f}s] paired engine ready "
              f"(pair_found={pf:.4f})", flush=True)
        # single-end engine SHARING the resident device arrays (same index
        # tables; the constructor would otherwise re-upload ~1.5 GB)
        t1 = time.time()
        self.single = self._transplant(
            SingleAligner, SingleAlignerConfig(seed_len=index.seed_len,
                                               cand_per_read=64))
        sout = self.single.align_batch_device(*self.batches[0][:2])
        sa = float((np.asarray(sout["result"]) > 0).mean())
        self.cold["single_ready_s"] = round(time.time() - t1, 1)
        self.cold["engine_ready_s"] = round(time.time() - t0, 1)
        print(f"[{time.time()-t0:6.1f}s] single engine ready "
              f"(aligned={sa:.4f})", flush=True)

    def _get_batches(self, batch_pairs, n=3):
        """wgsim batches at an arbitrary size, cached per size."""
        key = (batch_pairs, n)
        if key not in self._batch_cache:
            bs = []
            for s in range(n):
                r0, q0, r1, q1, _, _ = self._wgsim_pairs(
                    self.body, batch_pairs, READ_LEN, seed=s)
                bs.append(tuple(self._jnp.asarray(x)
                                for x in (r0, q0, r1, q1)))
            self._batch_cache[key] = bs
        return self._batch_cache[key]

    def _transplant(self, cls, cfg):
        """Build an aligner of class `cls` around the RESIDENT device
        arrays (no re-upload).  Both aligner classes keep identical device
        state: _dev, _cuckoo, genome_size (models/single.py:952-981,
        models/paired.py:512-545)."""
        al = object.__new__(cls)
        al.index = self.index
        al.cfg = cfg
        al._dev = self.aligner._dev
        al._cuckoo = self.aligner._cuckoo
        al.genome_size = self.aligner.genome_size
        al._aot = {}
        return al

    def _measure(self, aligner, batches, rounds, deadline_s, single=False):
        np = self.np
        batch_pairs = batches[0][0].shape[0]
        key = "result" if single else "pair_found"
        step = ((lambda b: aligner.align_batch_device(*b[:2])) if single
                else (lambda b: aligner.align_batch_device(*b)))
        rpb = batch_pairs if single else 2 * batch_pairs
        # un-timed warmup: the FIRST dispatch after an idle period pays a
        # tunnel/program reload stall (observed ~28 s after ~1 h idle, which
        # once turned a 56k measurement into 367 reads/s); it must never
        # land inside the timed window
        np.asarray(step(batches[0])[key])
        t0 = time.time()
        n = 0
        out = None
        for i in range(rounds):
            out = step(batches[i % len(batches)])
            n += rpb
            if time.time() - t0 > deadline_s and i >= 1:
                break
        val = np.asarray(out[key])   # REAL sync (PERF.md methodology)
        dt = time.time() - t0
        frac = float((val > 0).mean()) if single else float(val.mean())
        return dict(ok=True, reads_per_sec=n / dt,
                    rounds_completed=n // rpb,
                    fraction_pairs_found=frac,
                    batch_pairs=batch_pairs, cold_costs=self.cold)

    def measure(self, rounds, deadline_s, batch_pairs=BATCH_PAIRS):
        return self._measure(self.aligner, self._get_batches(batch_pairs),
                             rounds, deadline_s)

    def measure_se(self, rounds, deadline_s, batch_pairs=BATCH_PAIRS):
        return self._measure(self.single, self._get_batches(batch_pairs),
                             rounds, deadline_s, single=True)

    def profile(self, steps, single, batch_pairs):
        """Trace `steps` engine batches with jax.profiler; return the
        logdir for client-side xplane parsing (tools/xprof_dump.py).
        Profiles the most recently reload_measure'd engine when one
        exists, so profiles track the on-disk code."""
        import tempfile
        import jax
        np = self.np
        al = getattr(self, "last_reloaded", None)
        if al is None or bool(getattr(self, "last_reloaded_single", False)) \
                != bool(single):
            al = self.single if single else self.aligner
        key = "result" if single else "pair_found"
        step = ((lambda b: al.align_batch_device(*b[:2])) if single
                else (lambda b: al.align_batch_device(*b)))
        batches = self._get_batches(batch_pairs, n=max(3, steps))
        np.asarray(step(batches[0])[key])     # un-timed warmup
        logdir = tempfile.mkdtemp(prefix="xprof_srv_")
        with jax.profiler.trace(logdir):
            out = None
            for i in range(steps):
                out = step(batches[i % len(batches)])
            np.asarray(out[key])
        return dict(ok=True, logdir=logdir, steps=steps,
                    batch_pairs=batch_pairs)

    def reload_measure(self, kw, single, rounds, batch_pairs=BATCH_PAIRS):
        """Dev A/B: re-import engine modules from disk, rebuild the aligner
        on the resident device arrays, trace+compile, measure."""
        import importlib
        t0 = time.time()
        import snap_rnaseq_tpu.utils.aot_cache as aot_cache
        import snap_rnaseq_tpu.constants as constants
        import snap_rnaseq_tpu.utils.seed_sequencer as seed_sequencer
        import snap_rnaseq_tpu.ops.rowscan as rowscan
        import snap_rnaseq_tpu.ops.genome_gather as genome_gather
        import snap_rnaseq_tpu.ops.lookup as lookup
        import snap_rnaseq_tpu.ops.lv_pallas as lv_pallas
        import snap_rnaseq_tpu.ops.lv as lv
        import snap_rnaseq_tpu.ops.bitpar as bitpar
        import snap_rnaseq_tpu.models.single as m_single
        import snap_rnaseq_tpu.models.paired as m_paired
        for m in (aot_cache, constants, seed_sequencer, rowscan,
                  genome_gather, lookup, lv_pallas, lv, bitpar,
                  m_single, m_paired):
            importlib.reload(m)
        if single:
            cfg = m_single.SingleAlignerConfig(
                seed_len=self.index.seed_len, **kw)
            al = self._transplant(m_single.SingleAligner, cfg)
        else:
            base = dict(cand_per_read=64)
            base.update(kw)
            cfg = m_paired.PairedAlignerConfig(
                seed_len=self.index.seed_len, **base)
            al = self._transplant(m_paired.PairedAligner, cfg)
        reload_s = time.time() - t0
        self.last_reloaded = al
        self.last_reloaded_single = single
        t0 = time.time()
        out = self._measure(al, self._get_batches(batch_pairs), rounds,
                            deadline_s=600.0, single=single)
        out["compile_s"] = round(time.time() - t0 - 0.0, 1)
        out["reload_s"] = round(reload_s, 1)
        return out


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
                _send_msg(conn, dict(ok=True, ready=ready,
                                     cold_costs=engine.cold))
            elif cmd == "measure":
                _send_msg(conn, engine.measure(
                    int(req.get("rounds", 10)),
                    float(req.get("deadline_s", 120.0)),
                    int(req.get("batch_pairs", BATCH_PAIRS))))
            elif cmd == "measure_se":
                _send_msg(conn, engine.measure_se(
                    int(req.get("rounds", 10)),
                    float(req.get("deadline_s", 120.0)),
                    int(req.get("batch_pairs", BATCH_PAIRS))))
            elif cmd == "profile":
                _send_msg(conn, engine.profile(
                    int(req.get("steps", 4)),
                    bool(req.get("single", False)),
                    int(req.get("batch_pairs", BATCH_PAIRS))))
            elif cmd == "reload_measure":
                _send_msg(conn, engine.reload_measure(
                    req.get("kw", {}), bool(req.get("single", False)),
                    int(req.get("rounds", 20)),
                    int(req.get("batch_pairs", BATCH_PAIRS))))
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
