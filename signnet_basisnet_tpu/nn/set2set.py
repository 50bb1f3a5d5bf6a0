"""Set2Set pooling and recurrent helpers.

Set2Set (Vinyals et al.): an LSTM emits a query, attention over the graph's
nodes produces a readout, query and readout concatenate into the next LSTM
input; after T steps the [q, r] pair is the graph embedding (reference:
GraphPrediction/layers/pna_utils.py:114-190 and the torch_geometric Set2Set
used by Alchemy's NetGINE baseline, Alchemy/baseline_gin.py:29-61).

Masked per-graph softmax runs on the padded node layout via segment ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph import segment as seg
from .init import Linear


class Set2Set(nn.Module):
    features: int          # input feature dim; output is 2x
    processing_steps: int = 6
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, graph_id, num_graphs, node_mask=None,
                 training: bool = True):
        d = self.features
        cells = [nn.OptimizedLSTMCell(d, name=f"lstm_{i}")
                 for i in range(self.num_layers)]
        carries = [c.initialize_carry(jax.random.PRNGKey(0), (num_graphs, 2 * d))
                   for c in cells]
        # initialize_carry gives hidden size d from input shape (num_graphs, in)
        q_star = jnp.zeros((num_graphs, 2 * d), x.dtype)
        nm = node_mask if node_mask is not None else jnp.ones(x.shape[0])
        for _ in range(self.processing_steps):
            inp = q_star
            new_carries = []
            for c, carry in zip(cells, carries):
                carry, inp = c(carry, inp)
                new_carries.append(carry)
            carries = new_carries
            q = inp                                       # [G, d]
            e = (x * q[graph_id]).sum(-1, keepdims=True)  # [N, 1]
            alpha = seg.segment_softmax(e, graph_id, num_graphs, mask=nm)
            r = seg.segment_sum(alpha * x * nm[:, None], graph_id, num_graphs)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


class GRUStep(nn.Module):
    """Single GRU update h' = GRU(x, h) used between PNA layers (reference:
    GraphPrediction/layers/pna_utils.py:329-360)."""
    features: int

    @nn.compact
    def __call__(self, x, h):
        cell = nn.GRUCell(self.features, name="cell")
        new_h, _ = cell(h, x)
        return new_h


class S2SReadout(nn.Module):
    """Set2Set + halving MLP head (reference: pna_utils.py:363-407)."""
    features: int
    out: int
    processing_steps: int = 6

    @nn.compact
    def __call__(self, x, graph_id, num_graphs, node_mask=None,
                 training: bool = True):
        hg = Set2Set(self.features, self.processing_steps, name="set2set")(
            x, graph_id, num_graphs, node_mask, training=training)
        h = nn.relu(Linear(self.features, name="fc1")(hg))
        return Linear(self.out, name="fc2")(h)
