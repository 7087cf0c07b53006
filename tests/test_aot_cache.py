"""AOT executable-cache key behaviour (utils/aot_cache.py).

The disk cache only works if the key is a pure function of the PROGRAM:
jax's own persistent-cache key folds in a backend fingerprint the axon
platform rotates per session, which made every process recompile (measured
26-600 s per process before the stable key).  These tests pin the stable
-key contract on the CPU platform, where lowering is cheap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moip_aira_tpu.utils.aot_cache import _key_for


def _lower(fn, *args):
    return jax.jit(fn).lower(*args)


def test_key_deterministic_for_same_program():
    def f(x):
        return x @ x + 1.0

    a = jnp.ones((8, 8), jnp.float32)
    k1 = _key_for(_lower(f, a))
    k2 = _key_for(_lower(f, a))
    assert k1 == k2


def test_key_distinguishes_programs_and_shapes():
    def f(x):
        return x @ x + 1.0

    def g(x):
        return x @ x - 1.0

    a = jnp.ones((8, 8), jnp.float32)
    b = jnp.ones((16, 16), jnp.float32)
    kf = _key_for(_lower(f, a))
    kg = _key_for(_lower(g, a))
    kb = _key_for(_lower(f, b))
    assert kf != kg
    assert kf != kb


def test_cached_compile_falls_back_gracefully(tmp_path, monkeypatch):
    # cache dir pointed at a tmp dir: compile succeeds (CPU), entry written,
    # second call loads it (or cleanly falls back to the jitted fn — either
    # way the callable must produce correct results)
    monkeypatch.setenv("MOIP_EXEC_CACHE", str(tmp_path))
    from moip_aira_tpu.utils.aot_cache import cached_compile

    def f(x):
        return x * 2.0

    a = jnp.ones((4,), jnp.float32)
    c1 = cached_compile(jax.jit(f), (a,), tag="t")
    assert float(c1(a)[0]) == 2.0
    c2 = cached_compile(jax.jit(f), (a,), tag="t")
    assert float(c2(a)[0]) == 2.0
