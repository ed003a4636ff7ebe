"""Persistent compiled-executable cache.

The JAX persistent compilation cache does not cover remote (axon-tunnel)
TPU compiles: every fresh process re-pays the server-side compile, which
for K~9 multi-limb iteration programs is tens of minutes.  This module
caches the COMPILED EXECUTABLE itself (jax.experimental.serialize_executable)
keyed by a hash of the lowered StableHLO text + backend identity, so any
code or config change invalidates the entry automatically and a fresh
process re-loads in seconds.

This replaces the role of the reference's ahead-of-time C++ build: SDPB
compiles once at install time (/root/reference/wscript), while XLA compiles
per (program, shapes) — the cache amortizes that to once per config.

Usage:
    fn = cached_compile(jax.jit(f), *example_args)   # returns a callable
"""
from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
from pathlib import Path

import jax


def cache_dir() -> Path:
    d = os.environ.get("SDPB_TPU_CACHE",
                       os.path.expanduser("~/.cache/sdpb_tpu/xla"))
    p = Path(d) / "executables"
    p.mkdir(parents=True, exist_ok=True)
    return p


def _backend_key() -> str:
    dev = jax.devices()[0]
    return f"{jax.__version__}|{dev.platform}|{getattr(dev, 'device_kind', '')}"


def cached_compile(jitted, *args, verbose: bool = False):
    """Lower `jitted` on `args`, then return a compiled callable — from the
    on-disk executable cache when the (StableHLO, backend) pair matches a
    previous compile, else compiled now and persisted.

    Falls back silently to a plain .compile() when serialization is
    unsupported (e.g. multi-process meshes, interpret backends)."""
    from jax.experimental import serialize_executable as se

    if jax.process_count() > 1:
        # executables bake in process-local device assignments; rely on the
        # regular jit path there
        return jitted

    lowered = jitted.lower(*args)
    try:
        text = lowered.as_text()
    except Exception:
        return lowered.compile()
    key = hashlib.sha256(
        (text + "\0" + _backend_key()).encode()).hexdigest()[:32]
    path = cache_dir() / f"{key}.xc"

    if path.exists():
        try:
            payload, in_tree, out_tree = pickle.loads(path.read_bytes())
            loaded = se.deserialize_and_load(payload, in_tree, out_tree)
            if verbose:
                print(f"compile cache hit: {path.name}")
            return loaded
        except Exception as e:  # stale/corrupt/incompatible: recompile
            if verbose:
                print(f"compile cache entry unusable ({e!r}); recompiling")

    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        blob = pickle.dumps((payload, in_tree, out_tree))
        fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        if verbose:
            print(f"compile cache store: {path.name} ({len(blob)} bytes)")
    except Exception as e:
        if verbose:
            print(f"executable serialization unavailable ({e!r})")
    return compiled
