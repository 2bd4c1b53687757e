"""Device-mesh / sharding utilities.

The reference is strictly single-GPU (`devices=1` in every Trainer; SURVEY
§2.10) with dead NCCL helpers. The TPU-native equivalent is one
jax.sharding.Mesh over ICI with batch-dim NamedSharding for training and
extraction; gradient/metric reductions become compiler-inserted psums via jit
with sharding annotations (no hand-written collectives needed at this model
scale).

Two mesh layouts are supported:
- 1-D ('data',): pure data parallelism — params replicated, batch sharded,
  GSPMD inserts the grad psum over ICI. The warranted default for <=ViT-L
  encoders that fit one chip.
- 2-D ('data','model'): adds a tensor axis. `transformer_param_specs` builds
  Megatron-style PartitionSpecs (qkv/fc1 column-parallel, attn-proj/fc2
  row-parallel) or FSDP-style specs (every large param sharded on its
  largest divisible axis; all-gathered on use, grads reduce-scattered).
  GSPMD propagates activation shardings from the param annotations, so the
  train step itself is unchanged — annotate and jit.

rule='fsdp' also composes with the 1-D mesh (classic ZeRO-3: params and
optimizer state sharded over the *data* axis, weights all-gathered at use)
— `param_sharding_axis` picks the axis. Optimizer state is born sharded
via `init_optimizer_sharded` (jit(tx.init) alone would NOT inherit the
param placement: the zeros have no data dependence on the params, so XLA
is free to place the whole state on one device and the first train step
would silently reshard it).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dp_axis(mesh) -> Optional[str]:
    """The data-axis name if `mesh` is 1-D pure data parallelism (no tensor
    axis), else None. Gates the shard_map-wrapped Pallas paths: batch-grid
    kernels shard trivially over the data axis (each shard runs the
    single-device kernel on its local batch), while tensor-sharded params
    would need in-kernel collectives — those meshes keep the XLA graphs."""
    if mesh is None or len(mesh.axis_names) != 1:
        return None
    return mesh.axis_names[0]


def data_parallel_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis_name,))


def mesh_2d(
    n_data: int, n_model: int, axis_names: tuple = ("data", "model")
) -> Mesh:
    """(data x model) mesh. On real hardware lay 'model' on the faster ICI
    ring (jax.devices() order is the physical order on a slice); under the
    virtual CPU mesh the layout only affects which collective is emitted."""
    devs = jax.devices()
    n = n_data * n_model
    return Mesh(np.asarray(devs[:n]).reshape(n_data, n_model), axis_names)


def _megatron_spec(path: tuple, x, n_model: int, axis: str):
    """Column-parallel up-projections (qkv, mlp fc1), row-parallel
    down-projections (attention proj, mlp fc2); everything else replicated.
    Matches the transformer block naming shared by HTS-AT (models/htsat.py
    WindowAttention/Mlp) and the MAE ViTs (models/vit_mae.py)."""
    names = tuple(str(k.key) if hasattr(k, "key") else str(k) for k in path)
    if len(names) < 2 or x.ndim != 2 or names[-1] != "kernel":
        return P()
    parent = names[-2]
    # column-parallel: qkv / mlp up-projection (HTS-AT nests them as
    # attn/qkv + mlp/fc1; the MAE ViTs flatten to attn_qkv + mlp_fc1)
    if parent.endswith("qkv") or parent.endswith("fc1"):
        return P(None, axis) if x.shape[1] % n_model == 0 else P()
    # row-parallel: attention out-projection / mlp down-projection
    # (NOT patch_embed's 'proj' — that one has no attn ancestor)
    is_attn_proj = parent == "attn_proj" or (
        parent == "proj" and len(names) >= 3 and names[-3].endswith("attn")
    )
    if parent.endswith("fc2") or is_attn_proj:
        return P(axis, None) if x.shape[0] % n_model == 0 else P()
    return P()


def _fsdp_spec(path: tuple, x, n_model: int, axis: str, min_size: int):
    """Shard every sufficiently large param along its largest
    model-divisible axis (ZeRO-3 semantics: weights all-gathered at use,
    grads reduce-scattered, optimizer state sharded)."""
    if x.ndim == 0 or x.size < min_size:
        return P()
    order = sorted(range(x.ndim), key=lambda d: x.shape[d], reverse=True)
    for d in order:
        if x.shape[d] % n_model == 0 and x.shape[d] >= n_model:
            spec = [None] * x.ndim
            spec[d] = axis
            return P(*spec)
    return P()


def param_sharding_axis(mesh: Mesh, rule: str) -> str:
    """Mesh axis to shard params over. Megatron tensor parallelism needs a
    dedicated 'model' axis; FSDP/ZeRO-3 shards over the data axis when no
    tensor axis exists (params all-gathered at use, grads reduce-scattered
    — classic ZeRO-3 over pure DP)."""
    if "model" in mesh.axis_names:
        return "model"
    if rule == "fsdp":
        return mesh.axis_names[0]
    raise ValueError(
        "megatron param sharding needs a 'model' mesh axis "
        f"(got {mesh.axis_names}); use a dp x tp mesh or param_sharding=fsdp"
    )


def transformer_param_specs(
    params,
    mesh: Mesh,
    rule: str = "megatron",
    axis: str = "model",
    fsdp_min_size: int = 1024,
):
    """PartitionSpec tree for a transformer param tree on a mesh with a
    tensor axis. rule='megatron' | 'fsdp' (see module docstring)."""
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{axis}' axis: {mesh.axis_names}")
    n_model = mesh.shape[axis]
    if rule == "megatron":
        f = lambda p, x: _megatron_spec(p, x, n_model, axis)
    elif rule == "fsdp":
        f = lambda p, x: _fsdp_spec(p, x, n_model, axis, fsdp_min_size)
    else:
        raise ValueError(f"unknown param sharding rule: {rule!r}")
    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh: Mesh, specs):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _path_keys(path) -> tuple:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return tuple(out)


def optimizer_shardings(tx, params, mesh: Mesh, specs):
    """NamedSharding pytree for tx.init(params), matching each optimizer-state
    leaf to its param's PartitionSpec by path suffix (optax states embed
    param-shaped subtrees under mu/nu/etc; scalars like count fall back to
    replicated). Needed because jit(tx.init) does NOT propagate input
    shardings — zeros depend only on shapes, so XLA is free to place the
    whole state on one device; pass this as out_shardings to born-shard it."""
    flat_specs = {
        _path_keys(p): (s, tuple(x.shape))
        for (p, s), (_, x) in zip(
            jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda v: isinstance(v, P)
            )[0],
            jax.tree_util.tree_flatten_with_path(params)[0],
        )
    }
    shapes = jax.eval_shape(tx.init, params)

    def leaf_sharding(path, leaf):
        keys = _path_keys(path)
        for i in range(len(keys)):
            hit = flat_specs.get(keys[i:])
            if hit is not None and hit[1] == tuple(leaf.shape):
                return NamedSharding(mesh, hit[0])
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, shapes)


def init_optimizer_sharded(tx, params, mesh: Mesh, specs):
    """tx.init with the state born sharded (see optimizer_shardings)."""
    out_shardings = optimizer_shardings(tx, params, mesh, specs)
    return jax.jit(tx.init, out_shardings=out_shardings)(params)


def mesh_from_cli(cfg: dict):
    """(mesh, param_sharding) from hydra-style cfg keys dp / tp /
    param_sharding — the shared CLI contract (cli.pretrain, cli.finetune):
    dp=N is 1-D data parallelism; tp=M adds a ('data','model') tensor axis
    (Megatron param sharding by default); param_sharding=fsdp is ZeRO-3
    (over 'model' if tp>1, else over the data axis). Requesting
    param_sharding without any mesh is a config error, not a silent no-op."""
    dp, tp = int(cfg.get("dp", 1)), int(cfg.get("tp", 1))
    param_sharding = cfg.get("param_sharding")
    if tp > 1:
        return mesh_2d(dp, tp), (param_sharding or "megatron")
    if dp > 1:
        return data_parallel_mesh(dp), param_sharding
    if param_sharding is not None:
        raise ValueError(
            f"param_sharding={param_sharding!r} requires a device mesh; "
            "set dp=N (ZeRO-3 over data) or dp=N tp=M (tensor axis)"
        )
    return None, None


def shard_params_and_opt(params, tx, mesh: Mesh, rule: str):
    """Place params per `rule` and born-shard tx's state to match (the
    shared trainer sequence: specs -> shard_params -> init_optimizer_sharded).
    Returns (params, opt_state)."""
    specs = transformer_param_specs(
        params, mesh, rule=rule, axis=param_sharding_axis(mesh, rule)
    )
    params = shard_params(params, mesh, specs)
    return params, init_optimizer_sharded(tx, params, mesh, specs)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Put a host batch onto the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def place_like(target, host_tree):
    """device_put host_tree's leaves with the shardings of the matching
    leaves of `target` (an already-placed tree of identical structure).

    Used when restoring a checkpoint into a meshed run: ResumeCheckpointer
    returns host numpy trees, and feeding those straight to a train step
    compiled for sharded arguments would silently recompile for (and run
    with) the wrong layout. Placing against the pre-resume tree reproduces
    the exact init-time placement for any sharding rule."""
    return jax.tree.map(lambda t, v: jax.device_put(v, t.sharding), target, host_tree)
