"""On-disk compiled-executable cache for expensive TPU programs.

The axon backend compiles server-side and does NOT honor JAX's persistent
compilation cache directory; measured cold compiles of the STTN chunk
program run 150-400 s *per process* (the service's own cache only helps
within a process). This module caches the *compiled executable* itself via
``jax.experimental.serialize_executable``: the first process pays the
compile, every later process deserializes in ~1 s.

Key = sha256(lowered StableHLO text, jax version, platform, device kind),
so any change to the program, library, or hardware misses cleanly. Entries
are written atomically (tmp + rename) so concurrent processes can race
safely. Opt out with VSR_TPU_EXEC_CACHE=off; relocate with
VSR_TPU_EXEC_CACHE=<dir>.

No reference analog (the reference's torch CUDA kernels JIT in
milliseconds); this is TPU-infrastructure, like XLA's own persistent cache.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import warnings
from typing import Any, Callable, Optional

import jax

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "vsr_tpu", "executables"
)


def cache_dir() -> Optional[str]:
    val = os.environ.get("VSR_TPU_EXEC_CACHE", "")
    if val.lower() in ("off", "0", "none", "disabled"):
        return None
    return val or _DEFAULT_DIR


def _cache_key(lowered, example_args=()) -> str:
    dev = jax.devices()[0]
    h = hashlib.sha256()
    h.update(lowered.as_text().encode())
    h.update(jax.__version__.encode())
    h.update(dev.platform.encode())
    h.update(getattr(dev, "device_kind", "").encode())
    h.update(str(len(jax.devices())).encode())  # sharded programs pin topology
    # The call-side input pytree STRUCTURE must key too: a leafless arg (e.g.
    # a None flag added to a signature) leaves the lowered HLO byte-identical
    # while the serialized executable's in_tree changes — without this, a
    # stale entry deserializes and rejects every call with a pytree mismatch.
    h.update(str(jax.tree_util.tree_structure(example_args)).encode())
    return h.hexdigest()[:32]


class cached_jit:
    """Drop-in jax.jit replacement backed by the on-disk executable cache.

    Per call-signature (pytree structure + leaf shapes/dtypes) the function
    is lowered once and compiled through ``compile_cached`` — so every
    inference program (RAFT pairs, flow completion, propagation, generator
    windows, DBNet, LaMa ...) cold-starts from disk in seconds instead of
    recompiling on the axon service. Positional args only (that is all the
    inference wrappers use); kwargs fall back to the plain jitted path.
    """

    def __init__(self, fn, **jit_kwargs):
        static = jit_kwargs.get("static_argnums", ())
        self._static = {static} if isinstance(static, int) else set(static)
        self._jit = jax.jit(fn, **jit_kwargs)
        self._compiled: dict = {}
        # Identity memo for repeated big-pytree args (model params): computing
        # a 2500-leaf signature cost ~17 ms per dispatch in the round-4 LaMa
        # trace. Strong refs keep ids stable; bounded FIFO caps the leak.
        self._sig_memo: dict = {}

    @staticmethod
    def _leaf_sig(leaf):
        shape = getattr(leaf, "shape", None)
        if shape is not None:
            return (tuple(shape), str(getattr(leaf, "dtype", "")))
        return ("pyleaf", type(leaf).__name__)

    @staticmethod
    def _probe(arg):
        """O(depth) mutation sentinel for a memoized pytree: container sizes
        along the first-child path plus the identity and shape of the leaf it
        ends at. Catches in-place rebinds of a memoized params dict (the
        memo's identity guard alone would miss a mutated-in-place tree whose
        id is unchanged); trees must otherwise be rebound, never mutated."""
        node = arg
        sig = []
        for _ in range(16):
            if isinstance(node, dict) and node:
                sig.append(len(node))
                node = next(iter(node.values()))
            elif isinstance(node, (list, tuple)) and node:
                sig.append(len(node))
                node = node[0]
            else:
                break
        shape = getattr(node, "shape", None)
        sig.append((id(node), None if shape is None else tuple(shape)))
        return tuple(sig)

    def _arg_sig(self, i, arg):
        if i in self._static:
            return ("static", repr(arg))
        memo = self._sig_memo.get(id(arg))
        if memo is not None and memo[0] is arg and memo[2] == self._probe(arg):
            return memo[1]
        leaves, treedef = jax.tree_util.tree_flatten(arg)
        sig = (str(treedef), tuple(self._leaf_sig(l) for l in leaves))
        if len(leaves) > 16:  # only big trees are worth memoizing
            if len(self._sig_memo) >= 8:
                self._sig_memo.pop(next(iter(self._sig_memo)))
            self._sig_memo[id(arg)] = (arg, sig, self._probe(arg))
        return sig

    def __call__(self, *args, **kwargs):
        if kwargs:
            return self._jit(*args, **kwargs)
        key = tuple(self._arg_sig(i, a) for i, a in enumerate(args))
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._compiled[key] = compile_cached(self._jit, *args)
        # AOT-compiled callables take only the dynamic args (statics baked in)
        dyn = [a for i, a in enumerate(args) if i not in self._static]
        return fn(*dyn)


def _on_cpu(example_args) -> bool:
    """True when any committed arg lives on a CPU device: jit will place the
    program on CPU there, and a CPU executable must not be cached under the
    accelerator's key (CPU compiles are fast anyway)."""
    for leaf in jax.tree_util.tree_leaves(example_args):
        devs = getattr(leaf, "devices", None)
        if callable(devs):
            try:
                if any(d.platform == "cpu" for d in leaf.devices()):
                    return True
            except Exception:
                continue
    return False


def compile_cached(jitted: Callable, *example_args: Any):
    """Lower + compile ``jitted`` for ``example_args``, with a disk cache.

    Returns a callable compiled executable (same call signature as the
    jitted function for these argument shapes). Falls back to a plain
    ``lowered.compile()`` whenever caching is unavailable or fails —
    correctness never depends on the cache.
    """
    lowered = jitted.lower(*example_args)
    cdir = cache_dir()
    if cdir is None or jax.default_backend() == "cpu" or _on_cpu(example_args):
        return lowered.compile()

    try:
        from jax.experimental import serialize_executable as se
    except ImportError:
        return lowered.compile()

    key = _cache_key(lowered, example_args)
    path = os.path.join(cdir, f"{key}.jaxexec")
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            os.utime(path)  # LRU touch
            return se.deserialize_and_load(payload, in_tree, out_tree)
        except Exception as e:  # stale/corrupt entry: recompile below
            warnings.warn(f"exec cache read failed ({type(e).__name__}: {e}); "
                          "recompiling")
            try:
                os.unlink(path)
            except OSError:
                pass

    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(cdir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cdir, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        os.replace(tmp, path)  # atomic vs concurrent writers
        _evict_lru(cdir)
    except Exception as e:
        warnings.warn(f"exec cache write failed ({type(e).__name__}: {e})")
    return compiled


def _evict_lru(cdir: str) -> None:
    """Bound total cache size (VSR_TPU_EXEC_CACHE_GB, default 10): drop the
    least-recently-used entries first. Reads touch mtime so hot programs
    survive."""
    try:
        budget = float(os.environ.get("VSR_TPU_EXEC_CACHE_GB", "10")) * 1e9
        entries = []
        for name in os.listdir(cdir):
            if not name.endswith(".jaxexec"):
                continue
            p = os.path.join(cdir, name)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
        total = sum(e[1] for e in entries)
        for mtime, size, p in sorted(entries):
            if total <= budget:
                break
            os.unlink(p)
            total -= size
    except OSError:
        pass
