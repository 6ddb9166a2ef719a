"""Persistent ahead-of-time (AOT) executable cache.

Why this exists: the paired engine is a single ~8 MB StableHLO module and
XLA:TPU takes ~10 minutes to compile it cold.  JAX's own persistent
compilation cache SHOULD absorb that across processes, but on this host
the cache key is unstable between runs (observed: byte-near-identical
executables written under four different keys within one hour), so every
fresh process recompiles.  The lowered module itself IS deterministic
(verified: identical StableHLO sha256 across processes), so we sidestep
the key problem entirely: serialize the compiled executable with
`jax.experimental.serialize_executable` under OUR OWN deterministic key
(source digest + shapes + config + env knobs + backend fingerprint) and
reload it with `deserialize_and_load`, which takes seconds.

This plays the role the reference gets for free from offline compilation:
its aligner is an -O2 C++ binary compiled once at build time
(reference: snap-rnaseq Makefile), while a jit engine pays compilation at
every process start.  The AOT cache moves that cost to build-once.

Safety: a cache entry is only ever a (payload, in_tree, out_tree) pickle
written by this module; any failure to load falls back to the normal jit
path.  Entries are keyed on everything that can change the executable,
so a stale hit after a code edit is impossible (the source digest moves).
"""
from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile
import time

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# env vars that are read at trace time somewhere in the engine: they are
# part of the program identity
_TRACE_ENV_VARS = ("SNAP_TPU_LV_LANES", "SNAP_TPU_LV_TILE",
                   "SNAP_TPU_FAST_SUB", "SNAP_TPU_LOOKUP",
                   "SNAP_TPU_TRUNC_MASS", "SNAP_TPU_LV",
                   "SNAP_TPU_COMPACT_TIER")

_source_digest_cache = None


# Subtrees/files whose code can appear inside a traced program.  Host-only
# code (io/, cli, writers, async stages, pipeline orchestration, this
# module) is excluded so editing it does not invalidate warmed executables.
_TRACED_SUBDIRS = ("models", "ops", "index", "parallel", "rna")
_TRACED_FILES = ("constants.py", os.path.join("utils", "seed_sequencer.py"),
                 os.path.join("utils", "tables.py"))
# host-side orchestration living inside the traced subtrees
_UNTRACED_FILES = {os.path.join("models", "pipeline.py"),
                   os.path.join("models", "paired_pipeline.py"),
                   os.path.join("rna", "pipeline.py")}


def source_digest() -> str:
    """Digest of the sources that define the traced programs."""
    global _source_digest_cache
    if _source_digest_cache is None:
        h = hashlib.sha256()
        paths = [os.path.join(_PKG_ROOT, f) for f in _TRACED_FILES]
        for sub in _TRACED_SUBDIRS:
            for dirpath, dirnames, filenames in sorted(
                    os.walk(os.path.join(_PKG_ROOT, sub))):
                dirnames.sort()
                paths.extend(os.path.join(dirpath, fn)
                             for fn in sorted(filenames)
                             if fn.endswith(".py"))
        for p in paths:
            if os.path.relpath(p, _PKG_ROOT) in _UNTRACED_FILES:
                continue
            if os.path.exists(p):
                h.update(os.path.relpath(p, _PKG_ROOT).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
        _source_digest_cache = h.hexdigest()
    return _source_digest_cache


def backend_fingerprint() -> str:
    import jax
    dev = jax.devices()[0]
    parts = [jax.__version__, jax.lib.__version__ if hasattr(jax, "lib")
             else "", dev.platform, getattr(dev, "device_kind", "?")]
    return "|".join(str(p) for p in parts)


def cache_dir() -> str:
    path = os.environ.get("SNAP_TPU_AOT_CACHE")
    if not path:
        # reuse the established bench-cache root when it exists (it
        # survives between sessions on the bench host); else /tmp
        root = ("/root/bench_cache" if os.path.isdir("/root/bench_cache")
                else tempfile.gettempdir())
        path = os.path.join(root, "snap_tpu_aot")
    os.makedirs(path, exist_ok=True)
    return path


def make_key(tag: str, shape_sig: str, static_sig: str) -> str:
    env_sig = ";".join(f"{k}={os.environ.get(k, '')}"
                       for k in _TRACE_ENV_VARS)
    h = hashlib.sha256()
    for part in (tag, source_digest(), backend_fingerprint(), env_sig,
                 shape_sig, static_sig):
        h.update(part.encode())
        h.update(b"\0")
    return h.hexdigest()[:32]


def shape_signature(tree) -> str:
    """Deterministic signature of a pytree of arrays/ShapeDtypeStructs."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sig = [str(treedef)]
    for leaf in leaves:
        sig.append(f"{getattr(leaf, 'dtype', type(leaf))}"
                   f"{getattr(leaf, 'shape', '')}")
    return "|".join(sig)


def aot_enabled() -> bool:
    """AOT caching is for the minutes-scale TPU compiles; XLA:CPU compiles
    are seconds-scale and tests churn through many tiny shapes, so the
    default is TPU-only.  SNAP_TPU_AOT=1/0 forces either way."""
    v = os.environ.get("SNAP_TPU_AOT")
    if v is not None:
        return v == "1"
    import jax
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform != "cpu"


def _log(msg: str) -> None:
    if os.environ.get("SNAP_TPU_AOT_QUIET") != "1":
        print(f"aot_cache: {msg}", file=sys.stderr, flush=True)


def load_or_compile(tag: str, jitted, dyn_args: tuple, static_kwargs: dict):
    """Return a jax Compiled for jitted(*dyn_args, **static_kwargs).

    dyn_args may be real arrays or ShapeDtypeStructs (a pytree); the
    compiled object is called with the REAL dynamic args in the same
    structure.  Loads a previously serialized executable when the key
    matches; otherwise lowers + compiles + serializes.  Returns None when
    both load and compile fail (caller falls back to plain jit dispatch).
    """
    from jax.experimental import serialize_executable as se

    key = make_key(tag, shape_signature(dyn_args),
                   repr(sorted(static_kwargs.items(), key=lambda kv: kv[0])))
    path = os.path.join(cache_dir(), f"{tag}-{key}.aotexe")
    if os.path.exists(path):
        try:
            t0 = time.time()
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = se.deserialize_and_load(payload, in_tree, out_tree)
            _log(f"{tag}: loaded cached executable in "
                 f"{time.time() - t0:.1f}s ({path})")
            return compiled
        except Exception as e:  # stale/corrupt/incompatible: recompile
            _log(f"{tag}: cached executable unusable ({e!r}); recompiling")
    try:
        t0 = time.time()
        lowered = jitted.lower(*dyn_args, **static_kwargs)
        _log(f"{tag}: lowered in {time.time() - t0:.1f}s; compiling "
             "(cold TPU compile of the full engine takes minutes)")
        t0 = time.time()
        compiled = lowered.compile()
        _log(f"{tag}: compiled in {time.time() - t0:.1f}s")
    except Exception as e:
        _log(f"{tag}: AOT compile failed ({e!r})")
        return None
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        _log(f"{tag}: serialized executable -> {path} "
             f"({os.path.getsize(path) / 1e6:.0f} MB)")
    except Exception as e:  # serialization is an optimization only
        _log(f"{tag}: serialize failed ({e!r}); executable not cached")
    return compiled
