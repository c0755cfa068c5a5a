"""Reference-checkpoint import: our forward must equal the torch forward.

Builds a reference-format state_dict (the key schema of the reference's
``state_dict()`` — ``visbl.*``/``audbl.*``/``fusion.*``), imports it, and
checks ``avm_apply`` against an independent torch-functional execution of the
reference architecture (NCHW) on the same inputs — validating every layout
transpose and both flatten-boundary permutations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from cvml_goalnet_tpu.compat import (
    export_reference_state_dict,
    import_reference_state_dict,
)
from cvml_goalnet_tpu.models.avm import avm_apply
from cvml_goalnet_tpu.models.visual import visual_spatial_trace
from cvml_goalnet_tpu.models.audio import audio_temporal_trace

_STAGES = ((3, 3), (1, 1), (1, 1))  # (stride, padding) per conv — utils.py:151-163


def _reference_state_dict(cfg, rng):
    """Random reference-format weights for the given (small) config."""
    sd = {}
    chans = (3,) + cfg.model.vis_channels
    for i, (cin, cout) in enumerate(zip(chans[:-1], chans[1:]), start=1):
        sd[f"visbl.conv{i}.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.1
        sd[f"visbl.conv{i}.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.1
        sd[f"visbl.bnorm{i}.weight"] = rng.random(cout).astype(np.float32) + 0.5
        sd[f"visbl.bnorm{i}.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.1
        sd[f"visbl.bnorm{i}.running_mean"] = rng.standard_normal(cout).astype(np.float32) * 0.1
        sd[f"visbl.bnorm{i}.running_var"] = rng.random(cout).astype(np.float32) + 0.5
    h, w = visual_spatial_trace(cfg.preprocess.frame_size, len(cfg.model.vis_channels))[-1]
    flat = cfg.model.vis_channels[-1] * h * w
    sd["visbl.linear5.weight"] = rng.standard_normal((cfg.model.vis_feature_dim, flat)).astype(np.float32) * 0.05
    sd["visbl.linear5.bias"] = rng.standard_normal(cfg.model.vis_feature_dim).astype(np.float32) * 0.1

    achans = (cfg.audio.n_mfcc,) + cfg.model.aud_channels
    for i, (cin, cout) in enumerate(zip(achans[:-1], achans[1:]), start=1):
        sd[f"audbl.conv{i}.weight"] = rng.standard_normal((cout, cin, 3)).astype(np.float32) * 0.1
        sd[f"audbl.conv{i}.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.1
    t = audio_temporal_trace(cfg.audio.bin_length, len(cfg.model.aud_channels))[-1]
    sd["audbl.linear3.weight"] = rng.standard_normal((cfg.model.aud_feature_dim, cfg.model.aud_channels[-1] * t)).astype(np.float32) * 0.05
    sd["audbl.linear3.bias"] = rng.standard_normal(cfg.model.aud_feature_dim).astype(np.float32) * 0.1

    dims = (cfg.model.vis_feature_dim + cfg.model.aud_feature_dim,) + cfg.model.fusion_hidden + (1,)
    for li, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        sd[f"fusion.{3 * li}.weight"] = rng.standard_normal((dout, din)).astype(np.float32) * 0.05
        sd[f"fusion.{3 * li}.bias"] = rng.standard_normal(dout).astype(np.float32) * 0.1
    return sd


def _torch_reference_forward(sd, cfg, vis_nchw, aud_cb):
    """Independent torch-functional execution of the reference forward (eval)."""
    t = lambda k: torch.tensor(sd[k])
    x = torch.tensor(vis_nchw)
    for i, (stride, pad) in enumerate(_STAGES[: len(cfg.model.vis_channels)], start=1):
        x = F.conv2d(x, t(f"visbl.conv{i}.weight"), t(f"visbl.conv{i}.bias"), stride=stride, padding=pad)
        x = F.relu(x)
        x = F.max_pool2d(x, kernel_size=3, stride=1)
        x = F.batch_norm(
            x, t(f"visbl.bnorm{i}.running_mean"), t(f"visbl.bnorm{i}.running_var"),
            t(f"visbl.bnorm{i}.weight"), t(f"visbl.bnorm{i}.bias"), training=False,
        )
    x = torch.flatten(x, 1)
    x = F.relu(F.linear(x, t("visbl.linear5.weight"), t("visbl.linear5.bias")))

    a = torch.tensor(aud_cb)
    for i in range(1, len(cfg.model.aud_channels) + 1):
        a = F.relu(F.conv1d(a, t(f"audbl.conv{i}.weight"), t(f"audbl.conv{i}.bias"), stride=2, padding=1))
    a = torch.flatten(a, 1)
    a = F.relu(F.linear(a, t("audbl.linear3.weight"), t("audbl.linear3.bias")))

    h = torch.cat([a, x], dim=-1)  # [audio ‖ visual] — utils.py:266
    li = 0
    while f"fusion.{li}.weight" in sd:
        h = F.linear(h, t(f"fusion.{li}.weight"), t(f"fusion.{li}.bias"))
        if f"fusion.{li + 3}.weight" in sd:
            h = F.relu(h)
        li += 3
    return (4.0 * torch.sigmoid(h) + 1.0).numpy()


class TestReferenceImport:
    def test_forward_equivalence(self, small_cfg):
        rng = np.random.default_rng(0)
        sd = _reference_state_dict(small_cfg, rng)
        params, state = import_reference_state_dict(
            sd, small_cfg.model, small_cfg.preprocess, small_cfg.audio
        )

        n = 5
        vis_nhwc = rng.random((n, *small_cfg.preprocess.frame_size, 3)).astype(np.float32)
        aud_bc = rng.random((n, small_cfg.audio.bin_length, small_cfg.audio.n_mfcc)).astype(np.float32)

        ours, _ = avm_apply(
            params, state, jnp.asarray(vis_nhwc), jnp.asarray(aud_bc),
            cfg=small_cfg.model, train=False,
        )
        want = _torch_reference_forward(
            sd, small_cfg, vis_nhwc.transpose(0, 3, 1, 2), aud_bc.transpose(0, 2, 1)
        )
        np.testing.assert_allclose(np.asarray(ours), want, atol=2e-4)

    def test_audio_config_with_visual_only_checkpoint_raises(self, small_cfg):
        # silently omitting params["audio"] used to hand back a pytree
        # incongruent with the config and explode deep inside jit — the
        # import boundary must fail with the remedy (round-3 review)
        rng = np.random.default_rng(2)
        sd = _reference_state_dict(small_cfg, rng)
        sd = {k: v for k, v in sd.items() if not k.startswith("audbl.")}
        with pytest.raises(ValueError, match="no audbl"):
            import_reference_state_dict(
                sd, small_cfg.model, small_cfg.preprocess, small_cfg.audio)

    def test_no_audio_checkpoint(self, small_cfg):
        import dataclasses

        rng = np.random.default_rng(1)
        sd = _reference_state_dict(small_cfg, rng)
        # a no-audio (VM) checkpoint has no audbl.* keys and a smaller fusion.0
        sd = {k: v for k, v in sd.items() if not k.startswith("audbl.")}
        sd["fusion.0.weight"] = rng.standard_normal(
            (small_cfg.model.fusion_hidden[0], small_cfg.model.vis_feature_dim)
        ).astype(np.float32) * 0.05
        mc = dataclasses.replace(small_cfg.model, audio_included=False)
        params, state = import_reference_state_dict(sd, mc, small_cfg.preprocess, small_cfg.audio)
        assert "audio" not in params
        out, _ = avm_apply(
            params, state,
            jnp.asarray(rng.random((3, *small_cfg.preprocess.frame_size, 3)).astype(np.float32)),
            None, cfg=mc, train=False,
        )
        assert out.shape == (3, 1)


class TestReferenceExport:
    def test_import_export_roundtrips_bit_exact(self, small_cfg):
        # export ∘ import == identity on a reference-format state_dict
        rng = np.random.default_rng(3)
        sd = _reference_state_dict(small_cfg, rng)
        params, state = import_reference_state_dict(
            sd, small_cfg.model, small_cfg.preprocess, small_cfg.audio)
        back = export_reference_state_dict(
            params, state, small_cfg.model, small_cfg.preprocess, small_cfg.audio)
        bn_extra = {k for k in back if k.endswith("num_batches_tracked")}
        assert set(back) - bn_extra == set(sd)  # torch strict-load key parity
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    def test_export_import_roundtrips_our_pytree(self, small_cfg):
        # import ∘ export == identity on a freshly initialized pytree
        from cvml_goalnet_tpu.train.state import create_train_state

        st = create_train_state(jax.random.PRNGKey(5), small_cfg)
        sd = export_reference_state_dict(
            st.params, st.model_state, small_cfg.model, small_cfg.preprocess,
            small_cfg.audio)
        params, model_state = import_reference_state_dict(
            sd, small_cfg.model, small_cfg.preprocess, small_cfg.audio)
        for a, b in zip(jax.tree_util.tree_leaves(st.params),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(st.model_state),
                        jax.tree_util.tree_leaves(model_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_exported_forward_matches_torch(self, small_cfg):
        # a model initialized HERE, exported, must produce OUR scores when
        # executed by the torch-functional reference forward — the outbound
        # migration contract (reference main.py:326 load_state_dict + eval)
        rng = np.random.default_rng(4)
        st_params, st_state = import_reference_state_dict(
            _reference_state_dict(small_cfg, rng),
            small_cfg.model, small_cfg.preprocess, small_cfg.audio)
        sd = export_reference_state_dict(
            st_params, st_state, small_cfg.model, small_cfg.preprocess,
            small_cfg.audio)
        n = 4
        vis = rng.random((n, *small_cfg.preprocess.frame_size, 3)).astype(np.float32)
        aud = rng.random((n, small_cfg.audio.bin_length, small_cfg.audio.n_mfcc)).astype(np.float32)
        ours, _ = avm_apply(
            st_params, st_state, jnp.asarray(vis), jnp.asarray(aud),
            cfg=small_cfg.model, train=False)
        want = _torch_reference_forward(
            sd, small_cfg, vis.transpose(0, 3, 1, 2), aud.transpose(0, 2, 1))
        np.testing.assert_allclose(np.asarray(ours), want, atol=2e-4)

    def test_moe_fusion_refuses_export(self, small_cfg):
        import dataclasses

        from cvml_goalnet_tpu.train.state import create_train_state

        cfg = dataclasses.replace(
            small_cfg,
            model=dataclasses.replace(small_cfg.model, fusion_moe_experts=4))
        st = create_train_state(jax.random.PRNGKey(6), cfg)
        with pytest.raises(ValueError, match="MoE"):
            export_reference_state_dict(
                st.params, st.model_state, cfg.model, cfg.preprocess, cfg.audio)
