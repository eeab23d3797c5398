"""Gain-aware weight initializers (JAX) with reference-equivalent semantics.

Reference: /root/reference/SubgraphCountingMatching/utils/init.py:17-200.
JAX convention here: dense kernels have shape (fan_in, fan_out) and are used
as ``x @ W``; the torch reference stores Linear weights as (out, in).  The
initializers below reproduce the reference *distributions* for the JAX layout:

  * xavier_uniform(gain): U(-a, a), a = sqrt(3) * gain * sqrt(2/(in+out))
    (symmetric in fan order, so layout is irrelevant).
  * kaiming_normal(gain): N(0, gain/sqrt(fan_in)) with fan_in = the
    contraction dim (shape[0] for an (in, out) kernel) — matching torch's
    fan_in = weight.size(1) for (out, in) Linear weights.
  * equivariant: row 0 ~ kaiming-normal, row i = roll(row0, i)
    (init.py:88-103); kept as a full matrix whose rows are rolls.
  * identity / zero / orthogonal as in the reference.

Gains follow torch.nn.init.calculate_gain with LEAKY_RELU_A slope
(init.py:17-49).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LEAKY_RELU_A


def calculate_gain(activation: str) -> float:
    if activation in ("none", "identity", "maximum", "minimum", "linear"):
        return 1.0
    if activation in ("relu", "relu6", "elu", "selu", "celu", "gelu"):
        return math.sqrt(2.0)
    if activation in ("leaky_relu", "prelu") or activation.startswith("leaky_relu"):
        return math.sqrt(2.0 / (1.0 + LEAKY_RELU_A ** 2))
    if activation in ("softmax", "sparsemax", "gumbel_softmax", "sigmoid"):
        return 1.0
    if activation == "tanh":
        return 5.0 / 3.0
    raise NotImplementedError(f"no gain rule for activation '{activation}'")


def _fans(shape):
    if len(shape) < 2:
        return shape[0], shape[0]
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive, shape[-1] * receptive


def xavier_uniform(gain: float = 1.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * math.sqrt(2.0 / float(fan_in + fan_out))
        a = math.sqrt(3.0) * std
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


def kaiming_normal(gain: float = 1.0, fan_axis: int = 0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[fan_axis] if len(shape) >= 1 else 1
        std = gain / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def zeros_init() -> Callable:
    return lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)


def orthogonal(gain: float = 1.0) -> Callable:
    return jax.nn.initializers.orthogonal(scale=1.0)


def equivariant(gain: float = 1.0) -> Callable:
    """Circulant init: row i = roll(row 0, i); row 0 ~ kaiming-normal."""

    def init(key, shape, dtype=jnp.float32):
        assert len(shape) == 2, "equivariant init expects a 2D weight"
        n, d = shape
        row = kaiming_normal(gain)(key, (d,), dtype)
        idx = (jnp.arange(d)[None, :] - jnp.arange(n)[:, None]) % d
        return row[idx]

    return init


def identity_init(gain: float = 1.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * (2.0 / float(fan_in + fan_out))
        eye = jnp.eye(shape[-2], shape[-1], dtype=dtype)
        eye = jnp.broadcast_to(eye, shape)
        return eye + (std ** 2) * jax.random.normal(key, shape, dtype)

    return init


def get_initializer(init: str, activation: str = "none") -> Callable:
    """Name-based dispatch mirroring init_weight (init.py:125-143)."""
    gain = calculate_gain(activation)
    if init == "zero":
        return zeros_init()
    if init == "identity":
        return identity_init(gain)
    if init == "uniform":
        return xavier_uniform(gain)
    if init == "normal":
        return kaiming_normal(gain)
    if init == "orthogonal":
        return orthogonal(gain)
    if init == "equivariant":
        return equivariant(gain)
    raise ValueError(f"init='{init}' is not supported")


def scaled(initializer: Callable, scale: float) -> Callable:
    """Wrap an initializer, multiplying samples by `scale`.

    Used for the DMPLayer eigenvalue reparameterization: weights divided by
    init_neigenv / init_eeigenv right after init (dmpnn.py:79-86).
    """

    def init(key, shape, dtype=jnp.float32):
        return initializer(key, shape, dtype) * scale

    return init
