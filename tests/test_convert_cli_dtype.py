"""convert.cli --dtype: float leaves are cast for TPU serving, ints kept."""

import jax.numpy as jnp
import numpy as np

from opendwm_tpu.convert.cli import _map_leaves


def test_map_leaves_casts_floats_only():
    tree = {
        "a": {"w": np.ones((2, 3), np.float32), "idx": np.arange(4)},
        "b": np.ones(5, np.float16),
    }
    out = _map_leaves(
        lambda v: v.astype(jnp.bfloat16)
        if np.issubdtype(v.dtype, np.floating) else v, tree,
    )
    assert out["a"]["w"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.bfloat16
    assert out["a"]["idx"].dtype == np.arange(4).dtype
    np.testing.assert_allclose(np.asarray(out["a"]["w"], np.float32), 1.0)


def test_cli_exposes_dtype_flag():
    import argparse

    from opendwm_tpu.convert import cli

    # the flag must parse; run no conversion
    parser = argparse.ArgumentParser()
    try:
        cli.main(["--kind", "vae", "--input", "/nonexistent",
                  "--output", "/tmp/x", "--dtype", "bf16"])
    except FileNotFoundError:
        pass  # parsing succeeded; the input is expected to be absent
