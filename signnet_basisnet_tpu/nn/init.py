"""Parameter initializers matching the reference's PyTorch defaults.

torch.nn.Linear uses kaiming_uniform(a=sqrt(5)) for weights and
uniform(+-1/sqrt(fan_in)) for bias — both reduce to uniform(+-1/sqrt(fan_in)).
torch.nn.Embedding uses N(0, 1).  Matching the init *distributions* keeps
training dynamics comparable even though exact values differ by RNG.
"""
import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # flax Dense kernel shape is (fan_in, fan_out)
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init_for(fan_in):
    bound = 1.0 / float(max(fan_in, 1)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """nn.Dense with torch-default init (see module docstring)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", torch_linear_bias_init_for(fan_in),
                              (self.features,))
            y = y + bias
        return y


def embedding_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class Embedding(nn.Module):
    """Torch-style embedding table, N(0,1) init."""
    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, idx):
        table = self.param("embedding", embedding_init,
                           (self.num_embeddings, self.features))
        return jnp.take(table, idx, axis=0)


ACTIVATIONS = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "elu": nn.elu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "sigmoid": nn.sigmoid,
    "gelu": nn.gelu,
    "none": lambda x: x,
}
