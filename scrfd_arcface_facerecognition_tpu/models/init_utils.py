"""Parameter initialization helpers.

model.init traces AND EXECUTES the whole forward on the default backend —
through a remote-compiled TPU that costs minutes per model. cpu_init instead
uses jax.eval_shape (trace only, no compile/execute) and fills the resulting
shapes host-side with numpy randomness, then transfers once. Distributional
fidelity of the init doesn't matter for this framework's use: real weights
come from the ONNX importer, and training re-inits through the trainer.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fill(path_key: str, shape, dtype, rng: np.random.Generator):
    if dtype == jnp.bool_:
        return np.zeros(shape, bool)
    name = path_key.rsplit("/", 1)[-1]
    if name in ("bias", "mean"):
        return np.zeros(shape, np.float32).astype(dtype)
    if name in ("scale", "var"):
        return np.ones(shape, np.float32).astype(dtype)
    if name == "alpha":  # PReLU slope
        return np.full(shape, 0.25, np.float32).astype(dtype)
    if name.startswith("scale"):  # per-level head scales scale0/1/2
        return np.ones(shape, np.float32).astype(dtype)
    # conv/dense kernels: He-style fan-out normal
    fan_out = shape[-1] if len(shape) >= 1 else 1
    rec = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    std = float(np.sqrt(2.0 / max(fan_out * rec, 1)))
    return rng.normal(0.0, std, size=shape).astype(np.float32).astype(dtype)


def place_variables(variables):
    """Commit host-resident leaves (numpy, from the ONNX importer) to the
    default device ONCE; device arrays pass through untouched.

    jit does NOT cache host operands: a variables tree with numpy leaves
    re-uploads every weight on every call — ~70 MB/step for det_10g +
    w600k_r50, which measured 16x slower than the compute itself through
    the axon tunnel (862 ms vs 53 ms per detector forward). Every serving
    ctor (Detector/Embedder) routes its weights through here so imported,
    trained and random-init variables all behave identically."""
    return jax.tree.map(
        lambda x: x if isinstance(x, jax.Array) else jnp.asarray(x),
        variables)


def cpu_init(model, rng_key, sample_shape, **apply_kwargs):
    """Initialize `model` variables host-side, then place on the default
    device. sample_shape includes the batch dim, e.g. (1, 112, 112, 3)."""
    if isinstance(rng_key, int):
        seed = rng_key
    else:
        # Derive a host-side seed without touching the key's device buffer
        # (device readbacks are costly through remote transports).
        seed = 0
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        key = jax.random.PRNGKey(seed)
        shapes = jax.eval_shape(
            lambda: model.init(key, jnp.zeros(sample_shape, jnp.float32),
                               **apply_kwargs))
    rng = np.random.default_rng(seed)

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, leaf in flat:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        leaves.append(_fill(key, leaf.shape, leaf.dtype, rng))
    host = jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.device_put(host, jax.devices()[0])
