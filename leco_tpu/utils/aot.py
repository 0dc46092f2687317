"""AOT executable cache: skip trace+lower on warm starts.

Round-4 TTFI decomposition (scripts/probe_ttfi.py, quiet host): of the
~114 s warm time-to-first-iteration, the actual executable LOAD from the
persistent XLA cache is only ~10-17 s (181 MB zstd entry -> 950 MB raw,
pushed at ~103 MB/s); the rest is host-side work a warm start repeats
every process: bundle build (~17 s), jaxpr TRACE (~14 s), jaxpr->StableHLO
LOWER (~30 s), plus cache-key hashing. The persistent cache cannot skip
trace+lower because its key is derived FROM the lowered module.

This cache keys on semantics instead — (jax version, device kind, a
content hash of the leco_tpu sources, the caller's recipe string, and the
flattened arg shapes/dtypes/statics) — and stores the SERIALIZED COMPILED
EXECUTABLE (jax.experimental.serialize_executable) plus its pickled
arg/result pytrees. A warm start deserializes and loads directly:
device-init + bundle-build + executable-push + first-exec, no trace, no
lower, no HLO hash.

A source-content change rotates the key (stale executables can never run
new code); any failure falls back to the normal jit path.

MEASURED CAVEAT (round 4, tunneled axon v5e): `deserialize_and_load`
returns in ~20 s and the first call's `block_until_ready` returns
immediately — but the REAL chip-side program load (~80 s for the 950 MB
step) happens lazily at the first synchronous result fetch, so end-to-end
the AOT path reaches a usable first iteration ~45 s LATER than the
persistent-cache path (160 s vs 114 s). After that one-time load,
per-call behavior is normal (0.44-0.50 s sync, full-rate deferred). On a
locally-attached host, where the load is not tunnel-bound, skipping
trace+lower (~45 s host work) should win; here it is opt-in
(LECO_AOT=1)."""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable

_SRC_HASH = None


def _source_fingerprint() -> str:
    """Content hash of every leco_tpu .py file (fast: <1 MB total)."""
    global _SRC_HASH
    if _SRC_HASH is not None:
        return _SRC_HASH
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(dirpath, f)
                h.update(p.encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
    _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def cache_dir() -> str:
    d = os.environ.get("LECO_AOT_CACHE") or os.path.expanduser(
        "~/.cache/leco_tpu_aot"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _args_signature(args: tuple, static_kwargs: dict) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = [str(treedef)] + [
        f"{getattr(x, 'shape', ())}/{getattr(x, 'dtype', type(x).__name__)}"
        for x in leaves
    ] + [f"{k}={v}" for k, v in sorted(static_kwargs.items())]
    return hashlib.sha256("|".join(sig).encode()).hexdigest()[:16]


def cached_compile(
    jitted_fn: Callable,
    recipe: str,
    args: tuple,
    static_kwargs: dict | None = None,
    stage: Callable[[str], None] = lambda m: None,
) -> tuple[Callable, str]:
    """Return (compiled, status) where compiled(*args) runs the step with
    the statics baked in. status: 'aot-hit' (deserialized executable,
    trace+lower skipped), 'aot-miss' (compiled now, serialized for next
    time), or 'fallback:<why>'."""
    import jax

    static_kwargs = static_kwargs or {}
    dev = jax.devices()[0]
    key = hashlib.sha256(
        "|".join(
            [
                jax.__version__,
                getattr(dev, "device_kind", dev.platform),
                _source_fingerprint(),
                recipe,
                _args_signature(args, static_kwargs),
            ]
        ).encode()
    ).hexdigest()[:24]
    path = os.path.join(cache_dir(), f"{recipe}-{key}.jaxexec")

    if os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                blob = f.read()
            if blob[:4] == b"\x28\xb5\x2f\xfd":  # zstd frame
                import zstandard as zstd

                blob = zstd.ZstdDecompressor().decompress(
                    blob, max_output_size=4_000_000_000
                )
            payload, in_tree, out_tree = pickle.loads(blob)
            stage(f"AOT cache hit: {os.path.basename(path)} "
                  f"({os.path.getsize(path)/1e6:.0f} MB), loading")
            compiled = se.deserialize_and_load(payload, in_tree, out_tree)
            return compiled, "aot-hit"
        except Exception as e:  # stale/corrupt/api-skew -> recompile
            stage(f"AOT cache load failed ({type(e).__name__}: {e}); "
                  "recompiling")
            try:
                os.remove(path)
            except OSError:
                pass

    try:
        compiled = jitted_fn.trace(*args, **static_kwargs).lower().compile()
    except Exception as e:
        return jitted_fn, f"fallback:{type(e).__name__}"
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        blob = pickle.dumps((payload, in_tree, out_tree))
        try:  # ~5x smaller on disk; decompress is ~1 s (measured)
            import zstandard as zstd

            blob = zstd.ZstdCompressor(level=1).compress(blob)
        except ImportError:
            pass
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        stage(f"AOT executable serialized -> {os.path.basename(path)} "
              f"({os.path.getsize(path)/1e6:.0f} MB)")
        return compiled, "aot-miss"
    except Exception as e:
        stage(f"AOT serialize unsupported ({type(e).__name__}: {e}); "
              "continuing uncached")
        return compiled, "aot-miss-unserialized"
