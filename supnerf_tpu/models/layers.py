"""Shared layers and initializers.

Initializer distributions mirror the reference's torch defaults so that
training dynamics match: conv weights kaiming-normal (fan_out, relu gain),
linear weights/bias uniform(±1/sqrt(fan_in)), BN scale 1 / bias 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.nn.initializers import variance_scaling

# torch nn.Conv2d inside resnet: kaiming_normal_(fan_out, relu) => N(0, 2/fan_out)
conv_kaiming_init = variance_scaling(2.0, "fan_out", "normal")
# torch nn.Linear default: kaiming_uniform_(a=sqrt(5)) == U(±sqrt(1/fan_in))
linear_weight_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def linear_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / jnp.sqrt(fan_in)
    import jax

    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchDense(nn.Module):
    """Dense layer with torch-default init (weights and bias U(±1/sqrt(fan_in))).

    dtype: optional compute dtype (e.g. jnp.bfloat16). Params are stored in
    float32 and cast at use; the MXU accumulates in float32
    (preferred_element_type) so only operand precision drops.
    """

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", linear_weight_init, (fan_in, self.features))
        bias = self.param(
            "bias", lambda k, s: linear_bias_init(k, s, fan_in=fan_in), (self.features,)
        )
        if self.dtype is not None:
            import jax

            y = jax.lax.dot_general(
                x.astype(self.dtype), kernel.astype(self.dtype),
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return y + bias
        return x @ kernel + bias


class MLPStack(nn.Module):
    """n_layers of Dense(width) + ReLU, torch-style init. Used by the pose
    refiner's pose/regress blocks (reference model_supnerf.py:201-216)."""

    widths: tuple

    @nn.compact
    def __call__(self, x):
        for w in self.widths:
            x = nn.relu(TorchDense(w)(x))
        return x


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d equivalent (affine=False, eps 1e-5): per-sample
    per-channel normalization over the spatial dims. Supported as the
    reference's alternative encoder norm (model_supnerf.py:169-171)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


def batch_norm(train: bool, name: str | None = None):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1 on new stats).

    The reference NEVER switches to eval mode (no .eval() call anywhere in its
    trainers/optimizers), so normalization always uses current-batch statistics;
    callers should pass train=True even during test-time optimization to
    reproduce that behavior, and may pass train=False for conventional
    running-stat inference as an extension.
    """
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )
