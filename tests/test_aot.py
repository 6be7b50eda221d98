"""AOT executable cache (cellranger_tpu/aot.py).

The reference ships ahead-of-time native binaries with zero per-run
compile cost; aot_jit closes that gap for the jit hot paths by
serializing compiled executables to disk keyed on the lowered HLO hash
(VERDICT r4 item 3: cold-start compile amortization)."""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cellranger_tpu.aot import aot_jit, _AotJit


def _fresh(fn, **kw):
    """A new wrapper instance == a fresh process (empty in-proc memo)."""
    return _AotJit(fn, **kw)


def test_disabled_matches_jit(monkeypatch):
    monkeypatch.delenv("CRTPU_AOT_CACHE", raising=False)

    @aot_jit
    def f(x):
        return x * 2 + 1

    x = jnp.arange(8, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(f(x)),
                                  np.arange(8) * 2 + 1)
    assert not os.environ.get("CRTPU_AOT_CACHE")


def test_store_and_reload(tmp_path, monkeypatch):
    monkeypatch.setenv("CRTPU_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("CRTPU_AOT_CPU", "1")

    def f(x, y):
        return {"s": (x @ y).sum(), "m": x + y.T}

    x = jnp.ones((16, 8), jnp.float32)
    y = jnp.full((8, 16), 2.0, jnp.float32)
    w1 = _fresh(f)
    out1 = w1(x, y)
    files = list(tmp_path.glob("*.jaxexec"))
    assert len(files) == 1, files
    # fresh instance == fresh process: reloads from disk; on hosts where
    # the CPU AOT loader refuses the entry (ISA-feature mismatch) the
    # first-call guard falls back to plain jit — results identical either
    # way, and a rejected entry is evicted rather than left to refail
    w2 = _fresh(f)
    out2 = w2(x, y)
    for k in out1:
        np.testing.assert_array_equal(np.asarray(out1[k]),
                                      np.asarray(out2[k]))


def test_cpu_gated_off_by_default(tmp_path, monkeypatch):
    monkeypatch.setenv("CRTPU_AOT_CACHE", str(tmp_path))
    monkeypatch.delenv("CRTPU_AOT_CPU", raising=False)
    from cellranger_tpu import aot

    if jax.devices()[0].platform == "cpu":
        assert aot.cache_dir() is None   # SIGILL guard: no disk path on CPU
    w = _fresh(lambda x: x + 1)
    assert float(np.asarray(w(jnp.zeros(2)))[0]) == 1.0


def test_static_and_donate(tmp_path, monkeypatch):
    monkeypatch.setenv("CRTPU_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("CRTPU_AOT_CPU", "1")

    def f(rows, n, umi_len: int):
        return rows[: n if False else rows.shape[0]] * umi_len

    w = _fresh(f, static_argnames=("umi_len",), donate_argnums=(0,))
    rows = jnp.ones((32,), jnp.float32)
    # positional static
    out = w(jnp.array(rows), jnp.int32(4), 12)
    np.testing.assert_array_equal(np.asarray(out), np.full(32, 12.0))
    # keyword static, same shapes -> same executable entry per static value
    out2 = w(jnp.array(rows), jnp.int32(4), umi_len=7)
    np.testing.assert_array_equal(np.asarray(out2), np.full(32, 7.0))
    # reload path with statics
    w2 = _fresh(f, static_argnames=("umi_len",), donate_argnums=(0,))
    out3 = w2(jnp.array(rows), jnp.int32(4), 12)
    np.testing.assert_array_equal(np.asarray(out3), np.full(32, 12.0))


def test_dynamic_scalar_does_not_fragment(tmp_path, monkeypatch):
    monkeypatch.setenv("CRTPU_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("CRTPU_AOT_CPU", "1")
    calls = {"n": 0}

    def f(x, n):
        calls["n"] += 1
        return x + n

    w = _fresh(f)
    w(jnp.ones(4), 3)
    w(jnp.ones(4), 9)   # same sig: dynamic int keys by type, not value
    assert len(w._execs) == 1
    assert float(np.asarray(w(jnp.ones(4), 9))[0]) == 10.0


def test_traced_through_shard_map(tmp_path, monkeypatch):
    monkeypatch.setenv("CRTPU_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("CRTPU_AOT_CPU", "1")
    from jax.sharding import Mesh, PartitionSpec as P

    @aot_jit
    def f(x):
        return x * 2

    n = min(len(jax.devices()), 2)
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    g = jax.jit(jax.shard_map(lambda x: f(x) + 1, mesh=mesh,
                              in_specs=(P("data"),), out_specs=P("data")))
    out = g(jnp.arange(n * 4, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.arange(n * 4) * 2 + 1)


def test_code_change_misses(tmp_path, monkeypatch):
    monkeypatch.setenv("CRTPU_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("CRTPU_AOT_CPU", "1")

    def f1(x):
        return x * 2

    def f2(x):
        return x * 3

    w1 = _fresh(f1)
    w1(jnp.ones(4))
    w2 = _fresh(f2)   # different HLO -> different key, no false hit
    out = w2(jnp.ones(4))
    assert float(np.asarray(out)[0]) == 3.0
    assert len(list(tmp_path.glob("*.jaxexec"))) == 2
