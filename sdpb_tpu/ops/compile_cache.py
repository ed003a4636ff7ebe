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
    from . import mpfloat as _mp

    dev = jax.devices()[0]
    return (f"{jax.__version__}|{dev.platform}|"
            f"{getattr(dev, 'device_kind', '')}|"
            f"x64={jax.config.jax_enable_x64}|"
            # program-shaping tunables (env-overridable, platform-aware) —
            # same source can lower to different programs under different
            # effective knob values
            f"knobs={_mp._scan_min_k(False)},{_mp._scan_min_k(True)},"
            f"{_mp._SCAN_UNROLL},{_mp._VEC_MUL_MIN_K}")


_SOURCE_HASH = None
_MEMO: dict = {}   # in-process: key -> loaded executable (a run that
                   # rebuilds the same config must not re-deserialize)


def _source_hash() -> str:
    """Hash of every .py under the sdpb_tpu package: any source change
    invalidates all cheap-key entries (conservative but safe — the key
    must never outlive the code that built the program)."""
    global _SOURCE_HASH
    if _SOURCE_HASH is None:
        pkg = Path(__file__).resolve().parent.parent
        h = hashlib.sha256()
        for f in sorted(pkg.rglob("*.py")):
            h.update(str(f.relative_to(pkg)).encode())
            h.update(f.read_bytes())
        _SOURCE_HASH = h.hexdigest()
    return _SOURCE_HASH


def _tree_sig(args) -> str:
    """Structure + shapes/dtypes (+ MP metadata via the pytree structure)
    of the example args — everything that shapes the traced program except
    the code and config, both of which the caller supplies."""
    leaves, treedef = jax.tree.flatten(args)
    parts = [str(treedef)]
    for x in leaves:
        shape = getattr(x, "shape", ())
        dtype = getattr(x, "dtype", type(x).__name__)
        parts.append(f"{shape}:{dtype}")
    return "|".join(parts)


def config_key(cfg) -> str:
    """Deterministic key material for a (dataclass) config whose values are
    baked into the traced program as constants — covers numpy-array fields
    (e.g. centering-parameter limbs) by value."""
    import dataclasses

    import numpy as np

    parts = []
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if isinstance(v, np.ndarray):
            parts.append(f"{f.name}={v.dtype}{v.shape}:{v.tobytes().hex()}")
        elif isinstance(v, (tuple, list)) and v and isinstance(v[0], np.ndarray):
            parts.append(f.name + "=" + ",".join(
                f"{a.dtype}{a.shape}:{a.tobytes().hex()}" for a in v))
        else:
            parts.append(f"{f.name}={v!r}")
    return ";".join(parts)


def cached_compile(jitted, *args, verbose: bool = False,
                   key_extra: str = ""):
    """Return a compiled callable for `jitted(*args)` — from the on-disk
    executable cache when available, else compiled now and persisted.

    The cache key is CHEAP: (source-tree hash, backend, function qualname,
    arg tree signature, key_extra) — computed without tracing, so a warm
    start skips the full lower() (minutes for big MP iteration programs).
    Callers whose traced program depends on values not visible in the arg
    shapes (e.g. a StepConfig closure) must pass them via key_extra.

    Falls back silently to a plain .compile() when serialization is
    unsupported (e.g. multi-process meshes, interpret backends)."""
    from jax.experimental import serialize_executable as se

    if jax.process_count() > 1:
        # executables bake in process-local device assignments; rely on the
        # regular jit path there
        return jitted

    fn = getattr(jitted, "__wrapped__", jitted)
    ident = f"{getattr(fn, '__module__', '')}.{getattr(fn, '__qualname__', '')}"
    key = hashlib.sha256("\0".join([
        _source_hash(), _backend_key(), ident, _tree_sig(args), key_extra,
    ]).encode()).hexdigest()[:32]
    if key in _MEMO:
        return _MEMO[key]
    path = cache_dir() / f"{key}.xc"

    if path.exists():
        try:
            payload, in_tree, out_tree = pickle.loads(path.read_bytes())
            loaded = se.deserialize_and_load(payload, in_tree, out_tree)
            if verbose:
                print(f"compile cache hit: {path.name}")
            _MEMO[key] = loaded
            return loaded
        except Exception as e:  # stale/corrupt/incompatible: recompile
            if verbose:
                print(f"compile cache entry unusable ({e!r}); recompiling")

    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    _MEMO[key] = compiled
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
