"""Numeric sanitizer tests (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.debug import assert_finite, checked


def test_checked_passes_clean():
    f = checked(lambda x: {"y": x * 2.0, "z": (x + 1j * x).astype(jnp.complex64)})
    out = f(jnp.ones(8))
    np.testing.assert_allclose(np.asarray(out["y"]), 2.0)


def test_checked_catches_nan():
    from jax.experimental import checkify
    f = checked(lambda x: jnp.log(x))
    with pytest.raises(checkify.JaxRuntimeError):
        f(jnp.asarray([-1.0, 2.0]))


def test_assert_finite():
    assert_finite({"a": jnp.ones(4)}, "ok")
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([jnp.inf])}, "bad")
