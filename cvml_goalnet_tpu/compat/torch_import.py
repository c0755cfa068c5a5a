"""Import a reference-format PyTorch ``state_dict`` into our param pytrees.

Users of the reference hold trained checkpoints saved by
``torch.save(model.state_dict())`` (reference ``main.py:263,282``) with keys
named after its module attributes (``visbl.conv1.weight``,
``audbl.linear3.bias``, ``fusion.0.weight`` … — reference
``utils.py:145-258``).  This module maps those tensors onto our NHWC/NWC
pytrees so a reference-trained model runs here unchanged:

* conv2d ``(O, I, kH, kW)`` → HWIO; conv1d ``(O, I, K)`` → WIO;
* linear ``(O, I)`` → ``(I, O)``;
* the two flatten boundaries change order with the layout —
  visual: NCHW ``c·(H·W) + h·W + w`` → NHWC ``h·(W·C) + w·C + c``;
  audio:  ``(C, L)`` ``c·L + l``     → NWC  ``l·C + c`` —
  so the first linear after each flatten gets its input features permuted;
* batchnorm ``weight/bias/running_mean/running_var`` → scale/bias + state.

Works on actual ``.pt`` files (via torch, if installed) or on any mapping of
numpy arrays with the same keys (no torch needed).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cvml_goalnet_tpu.config import AudioConfig, ModelConfig, PreprocessConfig
from cvml_goalnet_tpu.models.audio import audio_temporal_trace
from cvml_goalnet_tpu.models.visual import visual_spatial_trace


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv2d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])      # (O, I, kH, kW)
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _conv1d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])      # (O, I, K)
    return {
        "w": jnp.asarray(w.transpose(2, 1, 0)),     # WIO
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _linear(sd, prefix, in_perm=None):
    w = _np(sd[f"{prefix}.weight"]).T    # (I, O)
    if in_perm is not None:
        w = w[in_perm]
    return {"w": jnp.asarray(w), "b": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _batchnorm(sd, prefix):
    params = {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }
    state = {
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }
    return params, state


def _nchw_to_nhwc_flat_perm(c: int, h: int, w: int) -> np.ndarray:
    """perm[nhwc_index] = nchw_index for the flatten boundary."""
    idx = np.arange(c * h * w).reshape(c, h, w)     # value = nchw index
    return idx.transpose(1, 2, 0).reshape(-1)       # iterate in nhwc order


def _cl_to_lc_flat_perm(c: int, length: int) -> np.ndarray:
    idx = np.arange(c * length).reshape(c, length)
    return idx.transpose(1, 0).reshape(-1)


def _require_reference_backbone(cfg: ModelConfig, direction: str) -> None:
    """The reference's ``VisBl`` is the only visual topology with a
    state_dict schema (``utils.py:145-195``) — resnet/vit pytrees have no
    reference-format counterpart, so migration fails loudly at the boundary
    instead of KeyError-ing mid-transform."""
    if cfg.vis_backbone != "reference":
        raise ValueError(
            f"checkpoint {direction} requires vis_backbone='reference' (the "
            f"topology the reference's state_dict schema describes) — got "
            f"{cfg.vis_backbone!r}"
        )


def import_reference_state_dict(
    state_dict,
    cfg: ModelConfig,
    pre: PreprocessConfig,
    aud: AudioConfig,
):
    """Reference state_dict (torch tensors or numpy) → (params, model_state).

    The returned pytrees are congruent with ``avm_init``'s and drop into
    ``avm_apply``/``TrainState`` directly.
    """
    _require_reference_backbone(cfg, "import")
    sd = dict(state_dict)
    params: dict = {"visual": {}, "fusion": []}
    state: dict = {"visual": {}}

    # Visual branch: conv1..3 + bnorm1..3 + linear5 (reference utils.py:151-170).
    for i in range(len(cfg.vis_channels)):
        params["visual"][f"conv{i}"] = _conv2d(sd, f"visbl.conv{i + 1}")
        bn_p, bn_s = _batchnorm(sd, f"visbl.bnorm{i + 1}")
        params["visual"][f"bn{i}"] = bn_p
        state["visual"][f"bn{i}"] = bn_s
    h, w = visual_spatial_trace(pre.frame_size, len(cfg.vis_channels))[-1]
    perm = _nchw_to_nhwc_flat_perm(cfg.vis_channels[-1], h, w)
    params["visual"]["head"] = _linear(sd, "visbl.linear5", perm)

    # Audio branch (reference utils.py:203-211).
    if cfg.audio_included and not any(k.startswith("audbl.") for k in sd):
        # silently omitting params["audio"] would hand back a pytree
        # incongruent with the config and explode later deep inside jit
        # (round-3 review) — fail at the import boundary instead
        raise ValueError(
            "cfg.audio_included=True but the state_dict has no audbl.* keys "
            "— this is a visual-only reference checkpoint; import it with an "
            "audio_included=False config (the reference's --train-no-audio "
            "variant, main.py:31-38)"
        )
    if cfg.audio_included:
        params["audio"] = {}
        for i in range(len(cfg.aud_channels)):
            params["audio"][f"conv{i}"] = _conv1d(sd, f"audbl.conv{i + 1}")
        t = audio_temporal_trace(aud.bin_length, len(cfg.aud_channels))[-1]
        perm = _cl_to_lc_flat_perm(cfg.aud_channels[-1], t)
        params["audio"]["head"] = _linear(sd, "audbl.linear3", perm)

    # Fusion Sequential: Linear layers at indices 0,3,6,9,12 (utils.py:242-256).
    li = 0
    while f"fusion.{li}.weight" in sd:
        params["fusion"].append(_linear(sd, f"fusion.{li}"))
        li += 3
    return params, state


def _f32(x) -> np.ndarray:
    # torch reference checkpoints are f32; bf16-trained pytrees upcast here.
    # np.array (copy) so the result is WRITABLE — torch.as_tensor on a
    # read-only jax-backed view warns about undefined behavior.
    return np.array(jnp.asarray(x, jnp.float32))


def export_reference_state_dict(
    params,
    model_state,
    cfg: ModelConfig,
    pre: PreprocessConfig,
    aud: AudioConfig,
) -> dict:
    """Inverse of :func:`import_reference_state_dict`: our pytrees → a
    reference-format ``state_dict`` of numpy arrays.

    Closes the migration loop in the other direction: a model trained here
    can be handed back to a consumer of the reference implementation —
    ``torch.save(export_reference_state_dict(...))`` produces a file the
    reference loads with its own ``load_state_dict`` (``main.py:65-66,326``;
    key schema from ``utils.py:145-258``).  Every layout transform is the
    exact inverse of the import path (HWIO→OIHW, WIO→OIK, (I,O)→(O,I), the
    two flatten-boundary permutations inverted with ``argsort``), so
    ``import → export`` and ``export → import`` round-trip bit-exactly
    (tested).  BatchNorm ``num_batches_tracked`` is emitted as 0 — torch's
    ``load_state_dict(strict=True)`` requires the key; the reference never
    reads it (default-momentum BN ignores the counter).
    """
    _require_reference_backbone(cfg, "export")
    sd: dict = {}
    for i in range(len(cfg.vis_channels)):
        c = params["visual"][f"conv{i}"]
        sd[f"visbl.conv{i + 1}.weight"] = _f32(c["w"]).transpose(3, 2, 0, 1)  # HWIO→OIHW
        sd[f"visbl.conv{i + 1}.bias"] = _f32(c["b"])
        bn_p = params["visual"][f"bn{i}"]
        bn_s = model_state["visual"][f"bn{i}"]
        sd[f"visbl.bnorm{i + 1}.weight"] = _f32(bn_p["scale"])
        sd[f"visbl.bnorm{i + 1}.bias"] = _f32(bn_p["bias"])
        sd[f"visbl.bnorm{i + 1}.running_mean"] = _f32(bn_s["mean"])
        sd[f"visbl.bnorm{i + 1}.running_var"] = _f32(bn_s["var"])
        sd[f"visbl.bnorm{i + 1}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    h, w = visual_spatial_trace(pre.frame_size, len(cfg.vis_channels))[-1]
    perm = _nchw_to_nhwc_flat_perm(cfg.vis_channels[-1], h, w)
    head = params["visual"]["head"]
    # import: ours = ref.T[perm]  ⇒  ref.T = ours[argsort(perm)]
    sd["visbl.linear5.weight"] = _f32(head["w"])[np.argsort(perm)].T
    sd["visbl.linear5.bias"] = _f32(head["b"])

    if cfg.audio_included:
        if "audio" not in params:
            raise ValueError(
                "cfg.audio_included=True but the pytree has no 'audio' branch "
                "— export with the audio_included=False config this model was "
                "trained under"
            )
        for i in range(len(cfg.aud_channels)):
            c = params["audio"][f"conv{i}"]
            sd[f"audbl.conv{i + 1}.weight"] = _f32(c["w"]).transpose(2, 1, 0)  # WIO→OIK
            sd[f"audbl.conv{i + 1}.bias"] = _f32(c["b"])
        t = audio_temporal_trace(aud.bin_length, len(cfg.aud_channels))[-1]
        aperm = _cl_to_lc_flat_perm(cfg.aud_channels[-1], t)
        ahead = params["audio"]["head"]
        sd["audbl.linear3.weight"] = _f32(ahead["w"])[np.argsort(aperm)].T
        sd["audbl.linear3.bias"] = _f32(ahead["b"])

    for li, layer in enumerate(params["fusion"]):
        if not isinstance(layer, dict) or "w" not in layer:
            raise ValueError(
                "fusion layer %d is not a plain linear (MoE heads have no "
                "reference-format equivalent — export requires "
                "fusion_moe_experts=0)" % li
            )
        sd[f"fusion.{3 * li}.weight"] = _f32(layer["w"]).T
        sd[f"fusion.{3 * li}.bias"] = _f32(layer["b"])
    return sd
