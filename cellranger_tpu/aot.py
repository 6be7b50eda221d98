"""AOT executable cache: compile once per machine, not once per process.

The reference pipeline has zero per-run compile cost (STAR and the Rust
stages are ahead-of-time native binaries; `align_and_count.rs:588` just
mmaps a prebuilt index).  A fresh cellranger_tpu process, by contrast,
pays XLA compiles for the fused counting step + dedup kernels — minutes
on remote-compile TPU backends where `jax_compilation_cache_dir` never
hits because compile keys are per-session.

`aot_jit` is a drop-in `jax.jit` wrapper that closes that gap:

  * first call per argument signature lowers the function and hashes the
    StableHLO module text together with the device fingerprint.  The hash
    IS the cache key, so any change to the traced program — code edit,
    shape change, captured constant, jax upgrade — misses automatically;
    there is no version bookkeeping to get wrong.
  * on a disk hit the serialized executable is loaded
    (jax.experimental.serialize_executable) instead of compiled: a fresh
    process pays trace+lower (seconds) instead of compile (minutes).
  * on a miss it compiles, serializes, and stores under
    $CRTPU_AOT_CACHE/<key>.jaxexec.

With CRTPU_AOT_CACHE unset the wrapper IS `jax.jit` (one extra dict probe
per call); tests and CPU runs see no behavior change.
"""

from __future__ import annotations

import functools
import hashlib
import logging
import os
import pickle
import threading

log = logging.getLogger("cellranger_tpu.aot")

_FORMAT_VERSION = 1


def cache_dir() -> str | None:
    """Active AOT cache directory, or None when disabled.

    CPU executables embed compile-machine ISA features and refuse to load
    on hosts without them (cpu_aot_loader SIGILL guard), so the disk path
    is TPU/GPU-only unless CRTPU_AOT_CPU=1 forces it (tests)."""
    d = os.environ.get("CRTPU_AOT_CACHE")
    if not d:
        return None
    try:
        import jax
        if (jax.devices()[0].platform == "cpu"
                and os.environ.get("CRTPU_AOT_CPU") != "1"):
            return None
    except Exception:
        return None
    return d


def _device_fingerprint() -> str:
    import jax
    d = jax.devices()[0]
    return f"{jax.__version__}|{d.platform}|{d.device_kind}|n{jax.device_count()}"


_SRC_HASH: str | None = None


def _package_source_hash() -> str:
    """Hash of every .py file in cellranger_tpu — the salt of the
    trace-skipping fast key.  Conservative: ANY source change invalidates
    all fast keys (the HLO-keyed executables themselves survive and
    re-link on the next lower)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        h = hashlib.sha256()
        pkg = os.path.dirname(os.path.abspath(__file__))
        for root, _dirs, files in sorted(os.walk(pkg)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _leaf_sig(x):
    """Dynamic-leaf cache key: shape/dtype/weak_type for arrays, type for
    scalars — matching jit's cache semantics (a Python 3 and a Python 7
    share one executable; shapes/dtypes/weakness distinguish)."""
    shape = getattr(x, "shape", None)
    if shape is None:
        return type(x).__name__
    return (tuple(shape), str(getattr(x, "dtype", "?")),
            bool(getattr(x, "weak_type", False)))


def _site_params_fingerprint() -> str:
    """Site tunables (params.py / parameters.toml) can change traced
    programs without a source change — they ride in the fast key."""
    try:
        from . import params
        table = {k: params.get(k) for k in sorted(params.DEFAULTS)}
        return hashlib.sha256(repr(table).encode()).hexdigest()[:12]
    except Exception:
        return "noparams"


class _AotJit:
    def __init__(self, fun, static_argnames=(), donate_argnums=()):
        self._fun = fun
        self._name = getattr(fun, "__name__", "fn")
        self._static = tuple(static_argnames)
        self._jit = None  # built lazily so import never touches jax
        self._jit_kwargs = dict(static_argnames=tuple(static_argnames),
                                donate_argnums=tuple(donate_argnums))
        self._execs: dict = {}
        self._lock = threading.Lock()
        import inspect
        try:
            params = list(inspect.signature(fun).parameters)
            self._static_pos = {i for i, p in enumerate(params)
                                if p in set(self._static)}
        except (TypeError, ValueError):
            self._static_pos = set()
        functools.update_wrapper(self, fun)

    # -- signature of a concrete call: static VALUES + dynamic leaf
    # shapes/dtypes (a dynamic scalar keys by type, like jit's cache) --
    def _sig(self, args, kwargs):
        import jax
        statics = tuple(
            (i, a) for i, a in enumerate(args) if i in self._static_pos
        ) + tuple(sorted(
            (k, v) for k, v in kwargs.items() if k in set(self._static)))
        dyn_args = tuple(a for i, a in enumerate(args)
                         if i not in self._static_pos)
        dyn_kwargs = {k: v for k, v in kwargs.items()
                      if k not in set(self._static)}
        leaves, treedef = jax.tree_util.tree_flatten((dyn_args, dyn_kwargs))
        return (statics, treedef, tuple(_leaf_sig(x) for x in leaves))

    def _get_jit(self):
        if self._jit is None:
            import jax
            kw = dict(self._jit_kwargs)
            if not kw["static_argnames"]:
                kw.pop("static_argnames")
            if not kw["donate_argnums"]:
                kw.pop("donate_argnums")
            self._jit = jax.jit(self._fun, **kw)
        return self._jit

    def _load_path(self, path):
        from jax.experimental import serialize_executable as se
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        loaded = se.deserialize_and_load(payload, in_tree, out_tree)
        return self._guard_first_call(self._strip_static(loaded), path)

    def _load_or_compile(self, args, kwargs, sig):
        """Return a callable(args..., kwargs...) for this signature."""
        root = cache_dir()
        jitted = self._get_jit()
        if root is None:
            return jitted
        from jax.experimental import serialize_executable as se
        try:
            # -- fast key: skip trace+lower entirely when this exact
            # (package source, device, fn, arg signature) ran before.
            # Static treedef metadata (e.g. DeviceIndex's genome_len /
            # pos_mode fields) rides in sig, so anything that changes the
            # traced program changes the fast key too.
            fast = hashlib.sha256(
                f"v{_FORMAT_VERSION}|{_package_source_hash()}|"
                f"{_site_params_fingerprint()}|"
                f"{_device_fingerprint()}|{self._name}|{sig!r}"
                .encode()).hexdigest()[:32]
            fk_path = os.path.join(root, f"{self._name}-{fast}.fk")
            if os.path.exists(fk_path):
                with open(fk_path) as f:
                    exec_path = os.path.join(root, f.read().strip())
                if os.path.exists(exec_path):
                    log.info("aot fast hit %s", self._name)
                    return self._load_path(exec_path)
            lowered = jitted.lower(*args, **kwargs)
            hlo = lowered.as_text()
            key = hashlib.sha256(
                f"v{_FORMAT_VERSION}|{_device_fingerprint()}|".encode()
                + hlo.encode()).hexdigest()[:32]
            fname = f"{self._name}-{key}.jaxexec"
            path = os.path.join(root, fname)

            def write_fk():
                try:
                    os.makedirs(root, exist_ok=True)
                    tmp = f"{fk_path}.tmp.{os.getpid()}"
                    with open(tmp, "w") as f:
                        f.write(fname)
                    os.replace(tmp, fk_path)
                except OSError:
                    pass

            if os.path.exists(path):
                log.info("aot hit %s (%s)", self._name, key)
                write_fk()
                return self._load_path(path)
            compiled = lowered.compile()
            try:
                payload, in_tree, out_tree = se.serialize(compiled)
                os.makedirs(root, exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump((payload, in_tree, out_tree), f)
                os.replace(tmp, path)
                write_fk()
                log.info("aot store %s (%s)", self._name, key)
            except Exception as e:  # non-serializable backend: still run
                log.info("aot store failed for %s: %s", self._name, e)
            return self._strip_static(compiled)
        except Exception as e:
            # any AOT-path failure degrades to plain jit, never breaks a run
            log.warning("aot path failed for %s: %s", self._name, e)
            return jitted

    def _guard_first_call(self, fn, path):
        """Validate a reloaded executable on its first invocation: a stale
        or machine-mismatched entry raises at load/run time — evict it and
        fall back to plain jit instead of failing the pipeline."""
        state = {"fn": fn, "checked": False}

        def call(*args, **kwargs):
            if state["checked"]:
                return state["fn"](*args, **kwargs)
            try:
                out = state["fn"](*args, **kwargs)
                import jax
                jax.block_until_ready(out)  # surface lazy load errors now
                state["checked"] = True
                return out
            except Exception as e:
                log.warning("aot reload %s unusable (%s); recompiling",
                            path, e)
                try:
                    os.remove(path)
                except OSError:
                    pass
                jitted = self._get_jit()
                state["fn"] = jitted
                state["checked"] = True
                return jitted(*args, **kwargs)
        return call

    def _strip_static(self, compiled):
        """Compiled executables bake static args in; drop them at call
        (whether the caller passed them positionally or by name)."""
        if not self._static:
            return compiled
        static = set(self._static)
        static_pos = self._static_pos

        def call(*args, **kwargs):
            args = tuple(a for i, a in enumerate(args) if i not in static_pos)
            kwargs = {k: v for k, v in kwargs.items() if k not in static}
            return compiled(*args, **kwargs)
        return call

    def __call__(self, *args, **kwargs):
        import jax
        leaves = jax.tree_util.tree_leaves((args, kwargs))
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            # traced through (shard_map / vmap / nested jit): inline via
            # the plain jitted fn — executables cannot consume tracers
            return self._get_jit()(*args, **kwargs)
        sig = self._sig(args, kwargs)
        fn = self._execs.get(sig)
        if fn is None:
            with self._lock:
                fn = self._execs.get(sig)
                if fn is None:
                    fn = self._load_or_compile(args, kwargs, sig)
                    self._execs[sig] = fn
        return fn(*args, **kwargs)


def aot_jit(fun=None, *, static_argnames=(), donate_argnums=()):
    """Drop-in jax.jit replacement backed by the disk executable cache."""
    if fun is None:
        return functools.partial(aot_jit, static_argnames=static_argnames,
                                 donate_argnums=donate_argnums)
    if isinstance(static_argnames, str):
        static_argnames = (static_argnames,)
    return _AotJit(fun, static_argnames=static_argnames,
                   donate_argnums=donate_argnums)
