"""Sharding rules: how batches and parameters lay out over the mesh.

Data axis: frame/clip batches shard their leading dim over ``"data"``.
Model axis: the fusion MLP's hidden layers shard Megatron-style over
``"model"`` — even layers split output features (column parallel), odd layers
split input features (row parallel) — so activations alternate
sharded/partial and XLA/GSPMD inserts exactly one all-reduce per pair.
SURVEY.md §2.3: "design mesh axes so TP could shard the fusion MLP if grown".
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading-axis data sharding for an ndim-dim batch tensor."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, x):
    """Device-put a host batch with its leading axis sharded over data."""
    return jax.device_put(x, batch_sharding(mesh, x.ndim))


def fusion_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the model params: fusion MLP tensor-parallel
    over ``"model"``, everything else replicated.

    Returns a pytree congruent with ``params``.
    """
    rep = replicated(mesh)

    def spec_for_fusion(i: int, n_layers: int, name: str):
        if i == n_layers - 1:
            return rep  # scalar head (out dim 1) stays replicated
        if name == "w":
            return NamedSharding(mesh, P(None, "model") if i % 2 == 0 else P("model", None))
        # biases live with the output features of column-parallel layers
        return NamedSharding(mesh, P("model") if i % 2 == 0 else P())

    out = jax.tree.map(lambda _: rep, params)
    if isinstance(params, dict) and "fusion" in params:
        n_layers = len(params["fusion"])
        out = dict(out)
        fusion_specs = []
        for i, layer in enumerate(params["fusion"]):
            if "experts" in layer:
                # MoE layer ({gate, experts} sub-dicts, models/moe.py): TP
                # does not split it — expert parallelism (parallel/ep.py)
                # is its sharding story — so it stays replicated, with a
                # spec tree CONGRUENT to the params (a flat {w, b} spec here
                # would crash jax.tree.map at placement)
                fusion_specs.append(jax.tree.map(lambda _: rep, layer))
            else:
                fusion_specs.append(
                    {k: spec_for_fusion(i, n_layers, k) for k in layer})
        out["fusion"] = fusion_specs
    return out


def transformer_param_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """Megatron head/MLP-parallel NamedSharding pytree for the temporal
    transformer scorer (``models/temporal_attention``).

    Per block: ``wq/wk/wv`` split output features over ``model_axis``
    (column parallel — with ``num_heads % n_model == 0`` each device owns
    whole heads), ``wo`` splits input features (row parallel), and the MLP
    pair does the same, so GSPMD inserts exactly one all-reduce per
    attention and one per MLP — the textbook Megatron layout, expressed as
    annotations instead of collective code.  ``proj_in``/``pos``/``head``/
    layernorms stay replicated (negligible FLOPs).  Because the sharding is
    GSPMD placement (not a different program), the EXISTING jitted train
    step runs tensor-parallel unchanged and its updates preserve the layout
    (tests/test_composed_parallel.py::TestTransformerTP).
    """
    rep = replicated(mesh)
    col = {"w": NamedSharding(mesh, P(None, model_axis)),
           "b": NamedSharding(mesh, P(model_axis))}
    row = {"w": NamedSharding(mesh, P(model_axis, None)), "b": rep}

    def layer_spec(layer):
        out = {}
        for k, v in layer.items():
            if k in ("wq", "wk", "wv", "mlp_in"):
                out[k] = {kk: col[kk] for kk in v}
            elif k in ("wo", "mlp_out"):
                out[k] = {kk: row[kk] for kk in v}
            else:  # layernorms
                out[k] = jax.tree.map(lambda _: rep, v)
        return out

    out = {k: jax.tree.map(lambda _: rep, v)
           for k, v in params.items() if k != "layers"}
    out["layers"] = [layer_spec(l) for l in params["layers"]]
    return out


def place_transformer_params(params, mesh: Mesh, model_axis: str = "model"):
    """Device-put temporal-transformer params in the Megatron TP layout."""
    return jax.tree.map(
        jax.device_put, params, transformer_param_shardings(params, mesh, model_axis)
    )


def place_params(params, mesh: Mesh, tensor_parallel: bool = False):
    """Device-put params replicated (DP) or TP-sharded (fusion over model axis)."""
    shardings = (
        fusion_param_shardings(params, mesh)
        if tensor_parallel
        else jax.tree.map(lambda _: replicated(mesh), params)
    )
    return jax.tree.map(jax.device_put, params, shardings)
