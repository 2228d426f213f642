"""Numerical sanitizers (SURVEY.md §5 race-detection/sanitizer row).

The reference is single-threaded C++ with no sanitizers. Here the hazards
are numerical (NaN/Inf escaping a kernel, int16 overflow at the capture
boundary) and distributed (halo races — which manifest as block-join
mismatches and are guarded by the §4 property tests). This module provides
the numeric guards:

- `checked(fn)`: wrap a chain step with jax.experimental.checkify NaN/Inf
  checks on every float output; errors carry the leaf path.
- `assert_finite(tree)`: eager host-side check for tests/debug sessions.
- Pallas kernels are debugged with `interpret=True` /
  `pltpu.force_tpu_interpret_mode()` (see tests/unit/test_mixfir_kernel.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable) -> Callable:
    """Wrap `fn` so every float leaf of its output is checked finite.

    Returns a function with the same signature; raises
    `checkify.JaxRuntimeError` (after `.throw()`) when a NaN/Inf appears.
    Composable with jit: the checks compile into the program.
    """

    def with_checks(*args, **kwargs):
        out = fn(*args, **kwargs)

        def check_leaf(path, leaf):
            if isinstance(leaf, jax.Array) and jnp.issubdtype(leaf.dtype, jnp.inexact):
                checkify.check(jnp.all(jnp.isfinite(
                    jnp.abs(leaf) if jnp.issubdtype(leaf.dtype, jnp.complexfloating)
                    else leaf)),
                    f"non-finite value in output leaf {jax.tree_util.keystr(path)}")
            return leaf

        jax.tree_util.tree_map_with_path(check_leaf, out)
        return out

    checked_fn = checkify.checkify(with_checks)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Host-side eager check (pulls values to host — tests/debug only)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.inexact) and not np.all(np.isfinite(
                np.abs(arr) if np.iscomplexobj(arr) else arr)):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
