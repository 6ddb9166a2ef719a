"""Multi-host scale-out: data-parallel FASTQ sharding with per-host
pipelines and merged outputs.

Reference role: RangeSplitter.h:37-55 (input chunking) +
ReadSupplierQueue.h:70-198 (decoupled suppliers) + ParallelTask.h (the
per-thread share-nothing loop), lifted from threads-on-one-box to
processes-on-many-hosts.

Design (TPU-first, deliberately share-nothing in the hot path):
  * Short-read alignment is embarrassingly data-parallel: reads need no
    cross-read communication, and the index is read-only.  Routing seed
    lookups across hosts over DCN would trade HBM-local gathers
    (~100s of GB/s) for network round-trips; instead the INDEX IS
    REPLICATED per host (like the reference replicates it across threads
    via shared memory) and the 'index' sharding stays within-host on the
    ICI mesh (parallel/sharded.py).  DCN carries only input ranges in and
    stats/output merge out — the same topology the scaling-book recipe
    prescribes for pure data parallelism.
  * Each host aligns a record-aligned byte range of the input
    (io/range_split.py), writing `out.part{k:04d}` + a stats JSON.
  * jax.distributed coordinates the processes; the final stats merge is a
    real cross-host collective (multihost_utils.process_allgather), and
    host 0 merges the output parts (streaming concat, or k-way merge by
    coordinate for sorted output).

The same worker runs unchanged on N real TPU hosts or as N local
processes on a CPU mesh (the dryrun in __graft_entry__.py spawns local
workers with xla_force_host_platform_device_count).
"""
from __future__ import annotations

import json
import os
import sys
import time


def _stats_vector(stats) -> "np.ndarray":
    import numpy as np
    return np.array([stats.total_reads, stats.useful_reads,
                     stats.single_hits, stats.multi_hits, stats.not_found,
                     getattr(stats, "aligned_as_pairs", 0),
                     stats.lv_calls], np.int64)


STATS_FIELDS = ("total_reads", "useful_reads", "single_hits", "multi_hits",
                "not_found", "aligned_as_pairs", "lv_calls")


def part_path(out_path: str, host_id: int) -> str:
    return f"{out_path}.part{host_id:04d}"


def run_host(index_dir: str, inputs, out_path: str, *,
             host_id: int, n_hosts: int, paired: bool,
             coordinator: str | None = None,
             sorted_output: bool = False, batch_size: int = 256,
             use_mesh: bool = True, aligner_overrides: dict | None = None,
             command_line: str = "snap-rna-tpu-mh") -> dict:
    """One host's worth of a multi-host alignment run.

    inputs: fastq path (single) or (fq0, fq1) (paired).
    Returns the merged global stats dict on every host (host 0 also writes
    the merged output).
    """
    import jax
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=n_hosts,
                                   process_id=host_id)

    from ..index.hash_index import GenomeIndex
    from ..io import range_split as rs

    index = GenomeIndex.load(index_dir)
    overrides = aligner_overrides or {}

    t0 = time.time()
    if paired:
        fq0, fq1 = inputs
        ranges = rs.split_paired_fastq_ranges(fq0, fq1, n_hosts)
        r0, r1 = ranges[host_id]
        supplier = rs.read_paired_fastq_range(fq0, fq1, r0, r1)
        from ..models.paired_pipeline import (PairedEndPipeline,
                                              PairedPipelineOptions)
        opt = PairedPipelineOptions(batch_size=batch_size,
                                    sorted_output=sorted_output)
        pipe = PairedEndPipeline(index, options=opt, **overrides)
        stats = pipe.run(supplier, None, part_path(out_path, host_id),
                         command_line=command_line)
    else:
        ranges = rs.split_fastq_ranges(inputs, n_hosts)
        supplier = rs.read_fastq_range(inputs, *ranges[host_id])
        from ..models.pipeline import PipelineOptions, SingleEndPipeline
        opt = PipelineOptions(batch_size=batch_size,
                              sorted_output=sorted_output)
        pipe = SingleEndPipeline(index, options=opt, **overrides)
        stats = pipe.run(supplier, part_path(out_path, host_id),
                         command_line=command_line)
    local_wall = time.time() - t0

    # ---- cross-host stats merge (the DCN collective) ----
    vec = _stats_vector(stats)
    if coordinator is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        all_vecs = multihost_utils.process_allgather(vec)
        merged = {f: int(all_vecs[:, i].sum())
                  for i, f in enumerate(STATS_FIELDS)}
        # every host must reach this point before host 0 merges parts
        multihost_utils.sync_global_devices("snap-mh-parts-done")
    else:
        # file-barrier fallback (no jax.distributed: e.g. shared-FS fleets)
        _write_part_stats(out_path, host_id, vec, local_wall)
        merged = _await_all_part_stats(out_path, n_hosts)

    if host_id == 0:
        merge_parts(out_path, n_hosts, sorted_output=sorted_output)
    if coordinator is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("snap-mh-merge-done")

    merged["local_wall_s"] = local_wall
    merged["host_id"] = host_id
    return merged


def _write_part_stats(out_path, host_id, vec, wall):
    p = f"{out_path}.stats{host_id:04d}.json"
    with open(p + ".tmp", "w") as f:
        json.dump({"vec": [int(x) for x in vec], "wall": wall}, f)
    os.replace(p + ".tmp", p)


def _await_all_part_stats(out_path, n_hosts, timeout=600.0):
    deadline = time.time() + timeout
    vecs = {}
    while len(vecs) < n_hosts:
        for k in range(n_hosts):
            if k in vecs:
                continue
            p = f"{out_path}.stats{k:04d}.json"
            if os.path.exists(p):
                with open(p) as f:
                    vecs[k] = json.load(f)["vec"]
        if len(vecs) < n_hosts:
            if time.time() > deadline:
                raise TimeoutError(f"only {len(vecs)}/{n_hosts} host stats")
            time.sleep(0.05)
    import numpy as np
    arr = np.array([vecs[k] for k in range(n_hosts)], np.int64)
    return {f: int(arr[:, i].sum()) for i, f in enumerate(STATS_FIELDS)}


def merge_parts(out_path: str, n_hosts: int, *, sorted_output: bool) -> None:
    """Merge per-host SAM parts into out_path.

    Unsorted: header of part 0 + streamed body concat (hosts hold
    contiguous input ranges, so concat preserves input order — the same
    ordering a single host would emit).  Sorted: k-way merge by
    (reference index, position) over the already-sorted parts
    (SortedDataWriter.cpp:90-478's merge phase, across hosts).
    BAM output stays per-part (samtools-cat-able); merging BGZF bodies
    needs no re-alignment work and is purely an output concern.
    """
    parts = [part_path(out_path, k) for k in range(n_hosts)]
    if out_path.endswith(".bam"):
        return   # per-part BAMs are the deliverable (documented above)
    with open(out_path, "wb") as out:
        if not sorted_output:
            for k, p in enumerate(parts):
                with open(p, "rb") as f:
                    for line in f:
                        if k > 0 and line[:1] == b"@":
                            continue
                        out.write(line)
            return
        import heapq

        def records(path, k):
            rname_order = {}
            with open(path, "rb") as f:
                for line in f:
                    if line[:1] == b"@":
                        if line.startswith(b"@SQ"):
                            for fld in line.split(b"\t"):
                                if fld.startswith(b"SN:"):
                                    rname_order[fld[3:].strip()] = \
                                        len(rname_order)
                        continue
                    fields = line.split(b"\t", 4)
                    rid = rname_order.get(fields[2], 1 << 30)
                    yield (rid, int(fields[3]), k), line

        with open(parts[0], "rb") as f:
            for line in f:
                if line[:1] != b"@":
                    break
                out.write(line)
        for _, line in heapq.merge(*(records(p, k)
                                     for k, p in enumerate(parts))):
            out.write(line)


def launch_local(n_hosts: int, index_dir: str, inputs, out_path: str, *,
                 paired: bool, devices_per_host: int = 1,
                 sorted_output: bool = False, batch_size: int = 64,
                 aligner_args: dict | None = None, use_distributed: bool = True,
                 timeout: float = 900.0) -> dict:
    """Spawn n_hosts local worker PROCESSES simulating a multi-host fleet
    (CPU backend; each process is one 'host' with devices_per_host virtual
    devices).  Exercises the REAL multi-host code path: jax.distributed
    init, per-process input ranges, cross-process stats allgather, output
    part merge.  Returns the merged stats printed by host 0."""
    import socket
    import subprocess

    coordinator = None
    if use_distributed:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            coordinator = f"127.0.0.1:{s.getsockname()[1]}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count="
                            f"{devices_per_host}").strip()
    procs = []
    for k in range(n_hosts):
        cmd = [sys.executable, "-m", "snap_rnaseq_tpu.parallel.multihost",
               "--index", index_dir, "--out", out_path,
               "--host-id", str(k), "--n-hosts", str(n_hosts),
               "--batch-size", str(batch_size)]
        if paired:
            cmd += ["--r0", inputs[0], "--r1", inputs[1]]
        else:
            cmd += ["--r0", inputs]
        if coordinator:
            cmd += ["--coordinator", coordinator]
        if sorted_output:
            cmd += ["--sorted"]
        for arg, flag in ((aligner_args or {}).get("cand_per_read"),
                          "--cand-per-read"), \
                         ((aligner_args or {}).get("max_seed_slots"),
                          "--max-seed-slots"):
            if arg is not None:
                cmd += [flag, str(arg)]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))))
    outs = []
    for k, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f"multihost worker {k} timed out")
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost worker {k} failed rc={p.returncode}:\n{err[-4000:]}")
        outs.append(out)
    merged = json.loads(outs[0].strip().splitlines()[-1])
    merged["n_hosts"] = n_hosts
    return merged


def main(argv=None):
    """Worker entry: python -m snap_rnaseq_tpu.parallel.multihost ..."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--r0", required=True)
    ap.add_argument("--r1", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--host-id", type=int, required=True)
    ap.add_argument("--n-hosts", type=int, required=True)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--sorted", action="store_true")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--cand-per-read", type=int, default=None)
    ap.add_argument("--max-seed-slots", type=int, default=None)
    args = ap.parse_args(argv)

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax
        jax.config.update("jax_platforms", "cpu")

    overrides = {}
    if args.cand_per_read is not None:
        overrides["cand_per_read"] = args.cand_per_read
    if args.max_seed_slots is not None:
        overrides["max_seed_slots"] = args.max_seed_slots
    paired = args.r1 is not None
    merged = run_host(args.index,
                      (args.r0, args.r1) if paired else args.r0,
                      args.out, host_id=args.host_id, n_hosts=args.n_hosts,
                      paired=paired, coordinator=args.coordinator,
                      sorted_output=args.sorted, batch_size=args.batch_size,
                      aligner_overrides=overrides)
    print(json.dumps(merged), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
