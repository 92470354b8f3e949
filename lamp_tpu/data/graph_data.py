"""Graph batching: pack many small graphs into one node/edge batch.

Capability parity with the reference's GraphBatchStream
(lamp-data/src/main/scala/lamp/data/GraphBatchStream.scala:28-198
``smallGraphStream``): concatenates node/edge tensors with offset-shifted
edge indices and a per-node graph index used for vertex pooling.

TPU note: batches are padded to fixed node/edge capacities so every jitted
step sees static shapes (pad nodes carry graph index = num_graphs and are
excluded from pooling by slicing).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..nn.graph import Graph
from .batchstream import BatchStream

__all__ = ["pack_graphs", "small_graph_stream"]


def pack_graphs(graphs: Sequence[Tuple[np.ndarray, Optional[np.ndarray],
                                        np.ndarray, np.ndarray]], *,
                node_capacity: Optional[int] = None,
                edge_capacity: Optional[int] = None) -> Graph:
    """Pack [(nodes, edge_features, edge_i, edge_j)] into a single Graph.

    Edge indices are shifted by each graph's node offset; vertex_pooling
    indices record graph membership. With capacities, pads nodes/edges (pad
    edges self-loop on the last pad node so they do not perturb real nodes).
    """
    n_total = sum(g[0].shape[0] for g in graphs)
    e_total = sum(len(g[2]) for g in graphs)
    node_cap = node_capacity or n_total
    edge_cap = edge_capacity or e_total
    if n_total > node_cap or e_total > edge_cap:
        raise ValueError("capacity too small")

    node_dim = graphs[0][0].shape[1]
    has_edge_feat = graphs[0][1] is not None
    edge_dim = graphs[0][1].shape[1] if has_edge_feat else 0

    nodes = np.zeros((node_cap, node_dim), graphs[0][0].dtype)
    edge_feats = (
        np.zeros((edge_cap, edge_dim), graphs[0][1].dtype) if has_edge_feat
        else None
    )
    ei = np.zeros((edge_cap,), np.int32)
    ej = np.zeros((edge_cap,), np.int32)
    pool = np.full((node_cap,), len(graphs), np.int32)  # pad -> extra graph id

    n_off = 0
    e_off = 0
    for gi, (nf, ef, i, j) in enumerate(graphs):
        n = nf.shape[0]
        e = len(i)
        nodes[n_off:n_off + n] = nf
        if has_edge_feat:
            edge_feats[e_off:e_off + e] = ef
        ei[e_off:e_off + e] = np.asarray(i) + n_off
        ej[e_off:e_off + e] = np.asarray(j) + n_off
        pool[n_off:n_off + n] = gi
        n_off += n
        e_off += e
    # pad edges: self-loops on a pad node (no-op for real nodes). When the
    # nodes exactly fill capacity there is no pad node to point at, so pad
    # edges would corrupt a real node's aggregation — refuse instead.
    if e_off < edge_cap:
        if n_off >= node_cap:
            raise ValueError(
                "pad edges need at least one pad node: raise node_capacity "
                f"above {n_off} (or lower edge_capacity to the exact count)"
            )
        ei[e_off:] = node_cap - 1
        ej[e_off:] = node_cap - 1
    return Graph(nodes, edge_feats, ei, ej, pool)


def small_graph_stream(graphs: List, targets: np.ndarray, graphs_per_batch: int,
                       *, rng: Optional[np.random.Generator] = None,
                       node_capacity: Optional[int] = None,
                       edge_capacity: Optional[int] = None) -> BatchStream:
    """Shuffled batches of packed small graphs + per-graph targets
    (reference smallGraphStream)."""
    n = len(graphs)
    targets = np.asarray(targets)
    if node_capacity is None:
        # +1 pad node: pad edges self-loop on it (pack_graphs refuses to
        # point pad edges at a real node)
        node_capacity = graphs_per_batch * max(
            g[0].shape[0] for g in graphs
        ) + 1
    if edge_capacity is None:
        edge_capacity = graphs_per_batch * max(max(len(g[2]), 1) for g in graphs)

    def gen():
        order = np.arange(n)
        if rng is not None:
            rng.shuffle(order)
        usable = n - (n % graphs_per_batch)
        for s in range(0, usable, graphs_per_batch):
            sel = order[s:s + graphs_per_batch]
            packed = pack_graphs(
                [graphs[i] for i in sel],
                node_capacity=node_capacity, edge_capacity=edge_capacity,
            )
            yield (packed, targets[sel])

    return BatchStream(gen, n // graphs_per_batch)
