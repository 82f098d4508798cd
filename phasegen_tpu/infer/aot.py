"""Shape-only AOT executable registry for overlapped serving cold starts.

One small mechanism shared by the stream and demo CLIs (and usable by any
caller): lower + compile a jitted function from ``jax.ShapeDtypeStruct``
trees — no weights needed, so the compile/restore runs while the H2D
weight upload streams (infer/upload.py) — then route later calls to the
compiled executable when the runtime signature matches, falling back to
the ordinary jit path otherwise. Extracted from infer/stream.py so the
fallback semantics can't drift between call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_avals(*trees):
    """Pytrees of arrays (host or device) -> same-structure
    ``ShapeDtypeStruct`` trees (shapes/dtypes only)."""
    out = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        trees)
    return out[0] if len(trees) == 1 else out


def _sig(args) -> tuple:
    return tuple((tuple(jnp.shape(l)), jnp.result_type(l).name)
                 for l in jax.tree.leaves(args))


class AotRegistry:
    """Keyed store of AOT-compiled executables with safe jit fallback.

    ``hits[key]`` counts calls served by the compiled executable —
    observability for tests and benchmarks (a silent signature mismatch
    would otherwise regress to the serial first-call compile the warm-up
    exists to hide).
    """

    def __init__(self):
        self._execs: dict = {}
        self.hits: dict = {}

    def __contains__(self, key) -> bool:
        return key in self._execs

    def __len__(self) -> int:
        return len(self._execs)

    def __iter__(self):
        return iter(self._execs)

    def keys(self):
        return self._execs.keys()

    def warm(self, key, jit_fn, *avals) -> None:
        """Lower + compile ``jit_fn`` at ``avals`` (ShapeDtypeStruct
        trees) and register the executable under ``key``."""
        self._execs[key] = (_sig(avals), jit_fn.lower(*avals).compile())
        self.hits.setdefault(key, 0)

    def call(self, key, jit_fn, *args):
        """Run the warmed executable for ``key`` if its signature matches
        ``args``; otherwise (or on a stale-executable error) the jit fn."""
        ent = self._execs.get(key)
        if ent is not None and ent[0] == _sig(args):
            try:
                out = ent[1](*args)
                self.hits[key] = self.hits.get(key, 0) + 1
                return out
            except (TypeError, ValueError):
                del self._execs[key]  # stale executable: recompile via jit
        return jit_fn(*args)
