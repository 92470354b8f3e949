"""Device meshes and sharding rules.

TPU-native replacement for the reference's two data-parallel engines
(lamp-data DataParallel.scala single-process multi-GPU and lamp.data.distributed
NCCL DDP, SURVEY.md §2.7-2.8): ONE SPMD implementation over a
``jax.sharding.Mesh``. The per-batch parameter broadcast + gradient
reduce-to-root (distributed/package.scala:683-719) disappears — parameters are
replicated (or sharded) once, and XLA inserts the gradient all-reduce over ICI
when the jitted train step consumes a batch sharded over the "dp" axis.

Beyond reference parity (near-free on TPU):
- parameter/optimizer-state sharding (ZeRO-style) via FSDP axis,
- tensor parallelism for the transformer family via sharding rules,
- multi-host DCN via ``jax.distributed.initialize``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "ShardingRules",
    "shard_tree",
    "replicate",
    "batch_sharding",
    "lm_tensor_parallel_rules",
    "fsdp_rules",
    "initialize_multihost",
]


def make_mesh(axes: Dict[str, int], *, devices=None) -> Mesh:
    """Create a named mesh, e.g. ``make_mesh({"dp": 2, "tp": 4})``.

    Axis sizes must multiply to the device count; pass ``-1`` for one axis to
    infer it.
    """
    devices = devices if devices is not None else jax.devices()
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {len(devices)} devices")
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(names))


class ShardingRules:
    """Ordered (path-regex -> PartitionSpec) rules for parameter pytrees.

    The path string is "/"-joined field names (e.g.
    ``"encoder/blocks/0/attention/w_q/weight"``). First match wins; default is
    replicated.
    """

    def __init__(self, rules: Sequence[Tuple[str, P]], default: P = P()):
        self.rules = [(re.compile(pat), spec) for pat, spec in rules]
        self.default = default

    def spec_for(self, path: str, ndim: int) -> P:
        for pat, spec in self.rules:
            if pat.search(path):
                if len(spec) > ndim:
                    raise ValueError(f"spec {spec} too long for rank-{ndim} {path}")
                return spec
        return self.default

    def shardings_for(self, tree, mesh: Mesh):
        def path_str(path):
            parts = []
            for k in path:
                if hasattr(k, "name"):
                    parts.append(str(k.name))
                elif hasattr(k, "idx"):
                    parts.append(str(k.idx))
                elif hasattr(k, "key"):
                    parts.append(str(k.key))
            return "/".join(parts)

        def make(path, leaf):
            if leaf is None:
                return None
            spec = self.spec_for(path_str(path), getattr(leaf, "ndim", 0))
            return NamedSharding(mesh, spec)

        return jax.tree_util.tree_map_with_path(
            make, tree, is_leaf=lambda x: x is None
        )


def shard_tree(tree, mesh: Mesh, rules: Optional[ShardingRules] = None):
    """Place a pytree on the mesh under the given rules (replicated default)."""
    rules = rules or ShardingRules([])
    shardings = rules.shardings_for(tree, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: None if x is None else jax.device_put(x, s),
        tree, shardings, is_leaf=lambda x: x is None,
    )


def replicate(tree, mesh: Mesh):
    return shard_tree(tree, mesh)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for [B, ...] batches: leading axis split over the dp axis."""
    return NamedSharding(mesh, P(axis))


def lm_tensor_parallel_rules(axis: str = "tp") -> ShardingRules:
    """Megatron-style tensor parallelism for the transformer/LM family:

    - attention q/k/v projections: output dim sharded (head parallelism),
    - attention output projection: input dim sharded (psum after),
    - MLP w1: output sharded; w2: input sharded,
    - embeddings: feature dim sharded.

    XLA's SPMD partitioner inserts the all-reduces at w_o / w2 boundaries.
    """
    return ShardingRules([
        (r"attention/w_[qkv]/weight", P(None, axis)),
        (r"attention/w_o/weight", P(axis, None)),
        (r"/w1/weight", P(None, axis)),
        (r"/w2/weight", P(axis, None)),
        (r"token_embedding/weight", P(None, axis)),
        (r"position_embedding/weight", P(None, axis)),
    ])


def modern_lm_tensor_parallel_rules(axis: str = "tp") -> ShardingRules:
    """Megatron-style tensor parallelism for :class:`~lamp_tpu.nn.ModernLM`
    (the LlamaBlock paths differ from the classic transformer's:
    projections live directly on the block, the MLP is SwiGLU w1/w3/w2):

    - w_q/w_k/w_v: output dim sharded (head parallelism — requires
      num_heads % tp == 0 and num_kv_heads % tp == 0),
    - w_o: input dim sharded (psum after),
    - SwiGLU w1/w3: output sharded; w2: input sharded,
    - token embedding (and an untied lm_head): FEATURE dim sharded, so the
      tied fused-CE logits matmul contracts over the sharded dim and XLA
      inserts one psum — logits/loss stay replicated, no vocab gather.
    """
    return ShardingRules([
        (r"blocks/\d+/w_[qkv]/weight", P(None, axis)),
        (r"blocks/\d+/w_o/weight", P(axis, None)),
        (r"mlp/w[13]/weight", P(None, axis)),
        (r"mlp/w2/weight", P(axis, None)),
        (r"token_embedding/weight", P(None, axis)),
        (r"lm_head/weight", P(axis, None)),
    ])


def fsdp_rules(axis: str = "fsdp", min_size: int = 2 ** 14,
               on_replicate: str = "warn") -> ShardingRules:
    """ZeRO-3-style fully-sharded rules: shard every large 2D+ parameter
    over the fsdp axis (XLA all-gathers weights per layer and
    reduce-scatters gradients). Prefers dim 0; if dim 0 is not divisible by
    the axis size (e.g. an odd-vocab embedding), tries the remaining dims in
    order before falling back to replication.

    ``on_replicate`` controls what happens when a ``>= min_size`` parameter
    cannot be sharded on any dim: ``"warn"`` (default) logs a warning once
    per shape, ``"raise"`` raises ``ValueError``, ``"silent"`` keeps the old
    behavior. Replicating a large parameter silently would defeat ZeRO
    without any visible signal (it costs axis-size times the expected
    per-device memory)."""
    if on_replicate not in ("warn", "raise", "silent"):
        raise ValueError(f"on_replicate={on_replicate!r}")

    class _FSDP(ShardingRules):
        def __init__(self):
            super().__init__([])
            self.axis = axis

        def spec_for(self, path: str, ndim: int) -> P:
            # FSDP specs are shape-dependent (which dim divides the axis
            # size), which a (path, ndim) signature cannot express; the
            # shardings_for override below handles whole trees. Raising
            # here beats returning a P(axis) that is invalid for any
            # parameter whose dim 0 is not divisible by the axis size.
            raise NotImplementedError(
                "fsdp_rules picks the sharded dim per-shape; use "
                "shardings_for(tree, mesh), not spec_for"
            )

        def shardings_for(self, tree, mesh: Mesh):
            n = mesh.shape[axis]
            warned = set()
            paths = _leaf_paths(tree)

            def make(path, leaf):
                if leaf is None:
                    return None
                if getattr(leaf, "ndim", 0) >= 2 and leaf.size >= min_size:
                    for dim in range(leaf.ndim):
                        if leaf.shape[dim] % n == 0:
                            spec = [None] * leaf.ndim
                            spec[dim] = axis
                            return NamedSharding(mesh, P(*spec))
                    msg = (
                        f"fsdp_rules: parameter {path!r} {leaf.shape} "
                        f"(size {leaf.size} >= min_size {min_size}) has no "
                        f"dim divisible by {axis}={n}; replicating — this "
                        f"costs {n}x the sharded memory. Pad the offending "
                        f"dim to a multiple of {n} (e.g. round the vocab up) "
                        f"or lower the mesh axis size."
                    )
                    if on_replicate == "raise":
                        raise ValueError(msg)
                    if on_replicate == "warn" and leaf.shape not in warned:
                        warned.add(leaf.shape)
                        import warnings

                        warnings.warn(msg, UserWarning, stacklevel=2)
                return NamedSharding(mesh, P())

            return jax.tree_util.tree_map(
                make, paths, tree, is_leaf=lambda x: x is None
            )

    return _FSDP()


def _leaf_paths(tree):
    """A pytree of the same structure whose leaves are "/"-joined key paths
    (for diagnostics)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None
    )
    names = [
        "/".join(_key_name(k) for k in path) or "<root>"
        for path, _ in paths_and_leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, names)


def _key_name(key) -> str:
    for attr in ("name", "key", "idx"):
        if hasattr(key, attr):
            return str(getattr(key, attr))
    return str(key)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization — replaces the reference's
    NcclUniqueId rendez-vous + Akka control plane (SURVEY.md §2.8). After
    this, ``jax.devices()`` spans all hosts and the same SPMD program runs
    everywhere (no Train/Valid/Stop protocol needed)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
