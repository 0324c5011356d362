"""Executable-cache unit tests (CPU: disk layer bypassed, AOT plumbing real).

The disk round-trip itself is TPU-only behavior (serialize_executable needs
the accelerator runtime) validated on hardware; here we pin the parts that
must not regress: cached_jit signature keying (shapes, dtypes, pytree
structure, static args), the AOT static-arg call convention, and
compile_cached fallbacks.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vsr_tpu.utils.exec_cache import cached_jit, compile_cached


def test_cached_jit_matches_jit():
    calls = []

    def f(x, y):
        calls.append(1)
        return x * 2.0 + y["b"]

    cj = cached_jit(f)
    a = jnp.arange(4.0)
    out = cj(a, {"b": jnp.ones(4)})
    np.testing.assert_allclose(np.asarray(out), np.arange(4.0) * 2 + 1)
    # same signature -> one trace/compile
    cj(a + 5, {"b": jnp.zeros(4)})
    assert len(cj._compiled) == 1
    # new shape -> new entry
    cj(jnp.arange(8.0), {"b": jnp.ones(8)})
    assert len(cj._compiled) == 2
    # new dtype -> new entry
    cj(jnp.arange(4), {"b": jnp.ones(4, jnp.int32)})
    assert len(cj._compiled) == 3


def test_cached_jit_static_args():
    cj = cached_jit(lambda x, n: x[:n] * 2.0, static_argnums=(1,))
    x = jnp.arange(8.0)
    np.testing.assert_allclose(np.asarray(cj(x, 3)), [0, 2, 4])
    np.testing.assert_allclose(np.asarray(cj(x, 5)), [0, 2, 4, 6, 8])
    assert len(cj._compiled) == 2  # distinct static values, distinct programs
    np.testing.assert_allclose(np.asarray(cj(x + 1, 3)), [2, 4, 6])
    assert len(cj._compiled) == 2


def test_sig_memo_detects_inplace_mutation():
    """ADVICE r4: a memoized big pytree (same object id) mutated in place
    with a differently-shaped leaf must NOT reuse its stale signature — that
    would dispatch an executable compiled for the old shapes."""
    cj = cached_jit(lambda p, x: x * p["k0"][0, 0])
    params = {f"k{i}": jnp.ones((2, 2)) for i in range(20)}  # >16 leaves
    x = jnp.arange(4.0)
    cj(params, x)
    assert id(params) in cj._sig_memo
    cj(params, x)
    assert len(cj._compiled) == 1
    params["k0"] = jnp.ones((3, 3))  # in-place rebind, id(params) unchanged
    cj(params, x)
    assert len(cj._compiled) == 2  # new program, not a stale-shape dispatch


def test_compile_cached_plain():
    jitted = jax.jit(lambda x: jnp.tanh(x) + 1)
    compiled = compile_cached(jitted, jnp.zeros((4,)))
    np.testing.assert_allclose(np.asarray(compiled(jnp.zeros((4,)))),
                               np.ones(4))
