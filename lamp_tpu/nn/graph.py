"""Graph neural networks: GCN, graph attention, MPNN, vertex pooling.

Capability parity with the reference's graph package
(lamp-core/src/main/scala/lamp/nn/graph/{Graph,GCN,GraphAttention,MPNN,
VertexPooling}.scala). Graphs are batched the reference way (many small graphs
packed into one node/edge tensor with a per-node graph index —
GraphBatchStream.scala:28).

TPU-first: message aggregation uses ``jax.ops.segment_sum`` (sorted-scatter
lowering on TPU) with static ``num_segments`` so everything jits with fixed
shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .layers import Dropout, Linear
from .module import Module, static_field

__all__ = ["Graph", "GCN", "gcn_aggregation", "GraphAttention", "MPNN",
           "vertex_pooling", "VertexPooling"]


class Graph(NamedTuple):
    """Reference: graph/Graph.scala:6 — node features [N,Dn], edge features
    [E,De], edge endpoints i->j, and per-node graph indices for pooling."""

    node_features: jax.Array
    edge_features: Optional[jax.Array]
    edge_i: jax.Array  # [E] int source
    edge_j: jax.Array  # [E] int target
    vertex_pooling_indices: Optional[jax.Array] = None  # [N] graph id


def gcn_aggregation(nodes, edge_i, edge_j, *, num_nodes: Optional[int] = None):
    """Symmetric-normalized adjacency aggregation with self loops:
    out = D^-1/2 (A+I) D^-1/2 x. Reference: GCN.gcnAggregation
    (graph/GCN.scala:125-158)."""
    n = num_nodes or nodes.shape[0]
    ones = jnp.ones_like(edge_i, dtype=nodes.dtype)
    deg = (
        jnp.full((n,), 1.0, nodes.dtype)  # self loop
        .at[edge_j].add(ones)
        .at[edge_i].add(ones)
    )
    inv_sqrt = jax.lax.rsqrt(deg)
    scaled = nodes * inv_sqrt[:, None]
    # undirected message passing both ways + self loops
    agg = scaled
    agg = agg.at[edge_j].add(scaled[edge_i])
    agg = agg.at[edge_i].add(scaled[edge_j])
    return agg * inv_sqrt[:, None]


class GCN(Module):
    """Graph convolution: transform then aggregate.

    Reference: graph/GCN.scala:10-124.
    """

    transform: Module

    @staticmethod
    def init(transform: Module) -> "GCN":
        return GCN(transform=transform)

    def forward(self, graph: Graph, *, key=None, train=False):
        h, t = self.transform.forward(graph.node_features, key=key, train=train)
        agg = gcn_aggregation(h, graph.edge_i, graph.edge_j)
        return graph._replace(node_features=agg), self.replace(transform=t)


class GraphAttention(Module):
    """Multihead edge-featured graph attention.

    Reference: graph/GraphAttention.scala:8-118: attention logits from
    [w_node_key1[i] | w_node_key2[j] | w_edge_key[e]], values from node+edge
    projections, softmax over incoming edges per target node, optional
    non-linearity and residual.
    """

    w_node_key1: Linear
    w_node_key2: Linear
    w_edge_key: Optional[Linear]
    w_node_value: Linear
    w_attention: Linear      # [3*qk or 2*qk] -> heads
    dropout: Dropout
    num_heads: int = static_field()
    non_linearity: bool = static_field()

    @staticmethod
    def init(node_dim: int, edge_dim: Optional[int], qk_dim: int, value_dim: int,
             num_heads: int, *, key, dropout: float = 0.0,
             non_linearity: bool = True, dtype=jnp.float32) -> "GraphAttention":
        keys = jax.random.split(key, 5)
        has_edge = edge_dim is not None and edge_dim > 0
        in_att = (3 if has_edge else 2) * qk_dim
        return GraphAttention(
            w_node_key1=Linear.init(node_dim, qk_dim, key=keys[0], dtype=dtype),
            w_node_key2=Linear.init(node_dim, qk_dim, key=keys[1], dtype=dtype),
            w_edge_key=(
                Linear.init(edge_dim, qk_dim, key=keys[2], dtype=dtype)
                if has_edge else None
            ),
            w_node_value=Linear.init(node_dim, value_dim, key=keys[3], dtype=dtype),
            w_attention=Linear.init(in_att, num_heads, key=keys[4], dtype=dtype),
            dropout=Dropout.init(dropout),
            num_heads=num_heads,
            non_linearity=non_linearity,
        )

    def forward(self, graph: Graph, *, key=None, train=False):
        n = graph.node_features.shape[0]
        h = self.num_heads
        k1 = self.w_node_key1(graph.node_features)
        k2 = self.w_node_key2(graph.node_features)
        parts = [k1[graph.edge_i], k2[graph.edge_j]]
        if self.w_edge_key is not None and graph.edge_features is not None:
            parts.append(self.w_edge_key(graph.edge_features))
        att_in = jnp.concatenate(parts, axis=-1)
        logits = jax.nn.leaky_relu(self.w_attention(att_in), 0.2)  # [E, H]

        # softmax over incoming edges of each target node, per head
        maxes = jnp.full((n, h), -jnp.inf, logits.dtype).at[graph.edge_j].max(logits)
        ex = jnp.exp(logits - maxes[graph.edge_j])
        denom = jnp.zeros((n, h), logits.dtype).at[graph.edge_j].add(ex)
        alpha = ex / jnp.maximum(denom[graph.edge_j], 1e-12)  # [E, H]
        if train and self.dropout.prob > 0:
            alpha, _ = self.dropout.forward(alpha, key=key, train=True)

        values = self.w_node_value(graph.node_features)  # [N, V]
        v = values[graph.edge_i].reshape(alpha.shape[0], h, -1)  # [E,H,V/H]
        weighted = v * alpha[:, :, None]
        out = jnp.zeros((n, h, v.shape[-1]), values.dtype).at[graph.edge_j].add(
            weighted
        )
        out = out.reshape(n, -1)
        if self.non_linearity:
            out = jax.nn.elu(out)
        if out.shape == graph.node_features.shape:
            out = out + graph.node_features  # residual as in reference
        return graph._replace(node_features=out), self


class MPNN(Module):
    """Message-passing NN: per-edge message MLP + aggregation + vertex update.

    Reference: graph/MPNN.scala:7-118.
    """

    message: Module   # [node_i | node_j | edge] -> message
    update: Module    # [node | agg_message] -> new node
    mean_aggregate: bool = static_field()

    @staticmethod
    def init(message: Module, update: Module,
             mean_aggregate: bool = True) -> "MPNN":
        return MPNN(message=message, update=update, mean_aggregate=mean_aggregate)

    def forward(self, graph: Graph, *, key=None, train=False):
        k1, k2 = jax.random.split(key) if key is not None else (None, None)
        n = graph.node_features.shape[0]
        parts = [graph.node_features[graph.edge_i],
                 graph.node_features[graph.edge_j]]
        if graph.edge_features is not None:
            parts.append(graph.edge_features)
        msg_in = jnp.concatenate(parts, axis=-1)
        msg, message = self.message.forward(msg_in, key=k1, train=train)
        agg = jnp.zeros((n, msg.shape[-1]), msg.dtype).at[graph.edge_j].add(msg)
        if self.mean_aggregate:
            counts = jnp.zeros((n,), msg.dtype).at[graph.edge_j].add(
                jnp.ones_like(graph.edge_j, dtype=msg.dtype)
            )
            agg = agg / jnp.maximum(counts, 1.0)[:, None]
        upd_in = jnp.concatenate([graph.node_features, agg], axis=-1)
        new_nodes, update = self.update.forward(upd_in, key=k2, train=train)
        return (
            graph._replace(node_features=new_nodes),
            self.replace(message=message, update=update),
        )


def vertex_pooling(graph: Graph, pooling: str = "mean",
                   num_graphs: Optional[int] = None):
    """Pool node features per graph (sum/mean/max).

    Reference: graph/VertexPooling.scala:8-60. ``num_graphs`` must be static
    under jit.
    """
    idx = graph.vertex_pooling_indices
    x = graph.node_features
    g = num_graphs if num_graphs is not None else int(idx.max()) + 1
    if pooling == "sum":
        return jnp.zeros((g, x.shape[-1]), x.dtype).at[idx].add(x)
    if pooling == "mean":
        s = jnp.zeros((g, x.shape[-1]), x.dtype).at[idx].add(x)
        c = jnp.zeros((g,), x.dtype).at[idx].add(jnp.ones_like(idx, dtype=x.dtype))
        return s / jnp.maximum(c, 1.0)[:, None]
    if pooling == "max":
        return jnp.full((g, x.shape[-1]), -jnp.inf, x.dtype).at[idx].max(x)
    raise ValueError(pooling)


class VertexPooling(Module):
    pooling: str = static_field()
    num_graphs: Optional[int] = static_field()

    @staticmethod
    def init(pooling: str = "mean", num_graphs: Optional[int] = None) -> "VertexPooling":
        return VertexPooling(pooling=pooling, num_graphs=num_graphs)

    def forward(self, graph: Graph, *, key=None, train=False):
        return vertex_pooling(graph, self.pooling, self.num_graphs), self
