"""AOT executable cache: skip trace+lower for known training programs.

The fresh-process north-star tax (PRECISION.md §6-7) has two parts: the
XLA executable read through the remote-compile tunnel (proportional to
program size — attacked by the fused line search, which halved it) and
the jax trace+lower of the training while_loop (~5-9 s per phase per
process, unavoidable through the jit path even when the persistent cache
already holds the compiled executable). This module caches the COMPILED
executable (jax.experimental.serialize_executable) keyed by everything
that determines the program — config, argument shapes/dtypes, statics,
jax version, backend — so a repeat process calls the loaded executable
directly, paying neither trace nor lowering nor cache lookup.

Scope: the pickled executable is a local, same-machine, same-jax-version
cache (the key includes both), NOT a distribution format. Any load/run
failure falls back silently to the normal jit path. Opt out with
GPZ_AOT=0; relocate with GPZ_AOT_DIR.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax

def _dir() -> str:
    return os.environ.get(
        "GPZ_AOT_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gpz_tpu", "aot"),
    )

#: in-process handle cache: deserialize once per process
_LOADED: dict = {}

import threading as _threading

_LOCK = _threading.Lock()
_INFLIGHT: dict = {}  # key -> Event set when a load attempt finished


def enabled() -> bool:
    return os.environ.get("GPZ_AOT") != "0"


_FINGERPRINT = None


def code_fingerprint() -> str:
    """Hash of the sources that determine the traced training programs —
    part of every cache key, so editing the objective/optimizer can never
    serve a stale executable (no manual version bump to forget)."""
    global _FINGERPRINT
    if _FINGERPRINT is None:
        import gpz_tpu.linalg
        import gpz_tpu.model
        import gpz_tpu.objective
        import gpz_tpu.ops.ozaki
        import gpz_tpu.optim.lbfgs
        import gpz_tpu.phi

        h = hashlib.sha256()
        for mod in (gpz_tpu.objective, gpz_tpu.phi, gpz_tpu.linalg,
                    gpz_tpu.ops.ozaki, gpz_tpu.optim.lbfgs, gpz_tpu.model):
            try:
                with open(mod.__file__, "rb") as fh:
                    h.update(fh.read())
            except OSError:
                h.update(mod.__name__.encode())
        _FINGERPRINT = h.hexdigest()[:16]
    return _FINGERPRINT


def _abstract_sig(tree) -> str:
    leaves = jax.tree.leaves(tree)
    return ";".join(
        f"{getattr(a, 'shape', None)}:{getattr(a, 'dtype', type(a).__name__)}"
        for a in leaves
    )


def cache_key(semantic_key: str, args_tree, statics: tuple) -> str:
    """Filesystem key for one compiled program.

    `semantic_key` must capture everything that determines the traced
    computation but is not visible in the argument avals — for the
    training loop that is the phase ModelConfig, completeness flags, and
    a code-version tag bumped when optimizer/objective tracing changes.
    """
    payload = "|".join([
        semantic_key,
        code_fingerprint(),
        _abstract_sig(args_tree),
        repr(statics),
        jax.__version__,
        jax.default_backend(),
    ])
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def load(key: str):
    """The deserialized Compiled for `key`, or None.

    Concurrency-safe: a load already in flight on another thread (the
    prefetcher) is waited on instead of duplicated — executable
    deserialization through a remote-compile backend is tens of seconds
    for the big training programs."""
    if not enabled():
        return None
    while True:
        with _LOCK:
            if key in _LOADED:
                return _LOADED[key]
            ev = _INFLIGHT.get(key)
            if ev is None:
                ev = _threading.Event()
                _INFLIGHT[key] = ev
                break
        ev.wait()
        with _LOCK:
            done = key in _LOADED
        if done:
            return _LOADED[key]
        return None  # the other attempt failed; caller rebuilds

    try:
        path = os.path.join(_dir(), key + ".jaxexe")
        if not os.path.exists(path):
            return None
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            with open(path, "rb") as fh:
                serialized, in_tree, out_tree = pickle.load(fh)
            compiled = deserialize_and_load(serialized, in_tree, out_tree)
        except Exception:  # corrupt / version-skewed / backend refuses
            try:
                os.remove(path)
            except OSError:
                pass
            return None
        with _LOCK:
            _LOADED[key] = compiled
        return compiled
    finally:
        with _LOCK:
            _INFLIGHT.pop(key, None)
        ev.set()


def _manifest_path() -> str:
    return os.path.join(_dir(), "manifest.json")


def note_group(group: str, key: str) -> None:
    """Record that `key` was used by the logical task `group`, so a later
    process can prefetch the whole group's executables up front."""
    if not enabled():
        return
    import json

    try:
        os.makedirs(_dir(), exist_ok=True)
        path = _manifest_path()
        with _LOCK:
            manifest = {}
            if os.path.exists(path):
                with open(path) as fh:
                    manifest = json.load(fh)
            keys = manifest.setdefault(group, [])
            if key not in keys:
                keys.append(key)
                tmp = path + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(manifest, fh)
                os.replace(tmp, path)
    except Exception:
        pass


def prefetch_group(group: str) -> None:
    """Start loading every executable previously recorded for `group` on
    a daemon thread. Hides the later phases' executable deserialization
    (~30 s for the f64 refine program through the remote-compile tunnel)
    under the earlier phases' execution — the dominant fresh-process cost
    after the persistent compilation cache is warm (PRECISION.md §9)."""
    if not enabled():
        return
    import json

    try:
        path = _manifest_path()
        if not os.path.exists(path):
            return
        with open(path) as fh:
            keys = json.load(fh).get(group, [])
    except Exception:
        return
    if not keys:
        return

    def work():
        for k in keys:
            try:
                load(k)
            except Exception:
                pass

    _threading.Thread(target=work, daemon=True).start()


def save(key: str, compiled) -> None:
    if not enabled():
        return
    try:
        from jax.experimental.serialize_executable import serialize

        payload = serialize(compiled)
        os.makedirs(_dir(), exist_ok=True)
        tmp = os.path.join(_dir(), key + ".tmp")
        with open(tmp, "wb") as fh:
            pickle.dump(payload, fh)
        os.replace(tmp, os.path.join(_dir(), key + ".jaxexe"))
        _LOADED[key] = compiled
    except Exception:  # serialization unsupported on this backend
        pass


def call_or_build(
    key: Optional[str],
    jitted: Callable,
    build_args: tuple,
    call_args: tuple,
    static_argnums_done: bool = True,
) -> Any:
    """Run `jitted(*build_args)` through the AOT cache.

    `build_args` are the full arguments (including statics) used for
    lower(); `call_args` the dynamic-only arguments the Compiled expects.
    Returns the outputs; falls back to the plain jit call on any miss
    that cannot be built (or when key is None).
    """
    if key is None or not enabled():
        return jitted(*build_args)
    compiled = load(key)
    if compiled is None:
        try:
            compiled = jitted.lower(*build_args).compile()
            save(key, compiled)
        except Exception:
            return jitted(*build_args)
    try:
        return compiled(*call_args)
    except Exception:
        return jitted(*build_args)
