"""Cross-framework parity: our JAX layers vs PyTorch-semantics equivalents.

BASELINE.json config 3 mandates "gradient checks vs reference".  The reference
model is PyTorch (``utils.py:145-272``); these tests build the same
computation with torch (CPU) from OUR config spec, copy OUR parameters in,
and assert forward outputs AND input/weight gradients agree to float32
tolerance.  This pins down layout conversions (NHWC↔NCHW, HWIO↔OIHW),
padding/stride conventions, batchnorm train/eval semantics, and Adam's update
rule — the places where a silent convention mismatch would otherwise corrupt
training without failing any shape check.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cvml_goalnet_tpu.models import layers as L
from cvml_goalnet_tpu.train.optim import adam_init, adam_update


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


class TestConv2d:
    @pytest.mark.parametrize("stride,padding", [(3, 3), (1, 1), (2, 0)])
    def test_forward_and_grads(self, stride, padding, rng):
        params = {
            "w": jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32)),  # HWIO
            "b": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
        }
        x = jnp.asarray(rng.standard_normal((2, 13, 13, 4)).astype(np.float32))  # NHWC

        def f(p, x):
            return jnp.sum(L.conv2d_apply(p, x, stride, padding) ** 2)

        ours = L.conv2d_apply(params, x, stride, padding)
        g_p, g_x = jax.grad(f, argnums=(0, 1))(params, x)

        # torch: NCHW / OIHW
        xt = _t(np.asarray(x).transpose(0, 3, 1, 2)).requires_grad_(True)
        wt = _t(np.asarray(params["w"]).transpose(3, 2, 0, 1)).requires_grad_(True)
        bt = _t(params["b"]).requires_grad_(True)
        yt = torch.nn.functional.conv2d(xt, wt, bt, stride=stride, padding=padding)
        np.testing.assert_allclose(
            np.asarray(ours), yt.detach().numpy().transpose(0, 2, 3, 1), atol=1e-4
        )
        torch.sum(yt**2).backward()
        np.testing.assert_allclose(
            np.asarray(g_x), xt.grad.numpy().transpose(0, 2, 3, 1), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(g_p["w"]), wt.grad.numpy().transpose(2, 3, 1, 0), atol=1e-3
        )
        np.testing.assert_allclose(np.asarray(g_p["b"]), bt.grad.numpy(), atol=1e-3)


class TestConv1d:
    def test_forward_stride2(self, rng):
        params = {
            "w": jnp.asarray(rng.standard_normal((3, 30, 64)).astype(np.float32)),  # WIO
            "b": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
        }
        x = jnp.asarray(rng.standard_normal((4, 30, 30)).astype(np.float32))  # NWC
        ours = L.conv1d_apply(params, x, stride=2, padding=1)
        xt = _t(np.asarray(x).transpose(0, 2, 1))              # NCW
        wt = _t(np.asarray(params["w"]).transpose(2, 1, 0))    # OIW
        yt = torch.nn.functional.conv1d(xt, wt, _t(params["b"]), stride=2, padding=1)
        assert ours.shape == (4, 15, 64)  # 30→15, the reference AudBl trace
        np.testing.assert_allclose(
            np.asarray(ours), yt.numpy().transpose(0, 2, 1), atol=1e-4
        )


class TestMaxPool:
    def test_k3_s1_valid(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 15, 15, 4)).astype(np.float32))
        ours = L.maxpool2d(x, 3, 1)
        xt = _t(np.asarray(x).transpose(0, 3, 1, 2))
        yt = torch.nn.functional.max_pool2d(xt, kernel_size=3, stride=1)
        assert ours.shape == (2, 13, 13, 4)  # reference VisBl 15→13
        np.testing.assert_allclose(np.asarray(ours), yt.numpy().transpose(0, 2, 3, 1), atol=1e-5)


class TestBatchNorm:
    def test_train_mode_and_running_stats(self, rng):
        c = 6
        params, state = L.batchnorm_init(c)
        x = jnp.asarray(rng.standard_normal((4, 5, 5, c)).astype(np.float32) * 3 + 1)
        y, new_state = L.batchnorm_apply(params, state, x, train=True)

        bn = torch.nn.BatchNorm2d(c, momentum=0.1, eps=1e-5).double()
        bn.train()
        xt = _t(np.asarray(x).transpose(0, 3, 1, 2))
        yt = bn(xt)
        np.testing.assert_allclose(np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(new_state["mean"]), bn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state["var"]), bn.running_var.numpy(), atol=1e-4)

    def test_eval_mode(self, rng):
        c = 6
        params, state = L.batchnorm_init(c)
        state = {"mean": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
                 "var": jnp.asarray(rng.random(c).astype(np.float32) + 0.5)}
        x = jnp.asarray(rng.standard_normal((4, 5, 5, c)).astype(np.float32))
        y, _ = L.batchnorm_apply(params, state, x, train=False)

        bn = torch.nn.BatchNorm2d(c).double()
        bn.eval()
        bn.running_mean = _t(state["mean"])
        bn.running_var = _t(state["var"])
        xt = _t(np.asarray(x).transpose(0, 3, 1, 2))
        yt = bn(xt)
        np.testing.assert_allclose(np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 1), atol=1e-4)


class TestAdam:
    def test_matches_torch_adam_over_steps(self, rng):
        w0 = rng.standard_normal((5, 3)).astype(np.float32)
        params = {"w": jnp.asarray(w0)}
        opt = adam_init(params)

        wt = torch.tensor(w0.astype(np.float64), requires_grad=True)
        topt = torch.optim.Adam([wt], lr=1e-3)

        for step in range(5):
            g = rng.standard_normal((5, 3)).astype(np.float32)
            params, opt = adam_update({"w": jnp.asarray(g)}, opt, params, lr=1e-3)
            topt.zero_grad()
            wt.grad = torch.tensor(g.astype(np.float64))
            topt.step()
        np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5)
