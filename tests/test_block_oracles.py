"""Numeric torch-oracle tests for the five network ports' building blocks.

The converters were previously validated on names/shapes only (VERDICT r1
missing #2): these tests pin the actual CONV/FIR/NORM semantics against
CPU torch computing the published definitions — upfirdn2d upsampling
(StyleGAN2/EG3D), modulated conv, bilinear resize (GFPGAN-clean), eval
BatchNorm / InstanceNorm (BiSeNet/MODNet), and torch's symmetric conv
padding (which XLA's "SAME" does NOT reproduce for stride>1).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x))


class TestEG3DPrimitives:
    def test_upsample2x_matches_upfirdn2d(self):
        """_upsample2x == canonical upfirdn2d(up=2, f=[1,3,3,1], gain=4):
        zero-stuff, pad (2,1), correlate — INCLUDING boundaries."""
        from fateavatar_tpu.completion.eg3d.networks import _upsample2x

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)  # NHWC, odd dims

        got = np.asarray(_upsample2x(jnp.asarray(x)))

        xt = _t(x).permute(0, 3, 1, 2)                        # NCHW
        n, c, h, w = xt.shape
        y = torch.zeros(n, c, 2 * h, 2 * w)
        y[:, :, ::2, ::2] = xt
        f1 = torch.tensor([1.0, 3.0, 3.0, 1.0])
        f2 = torch.outer(f1, f1)
        f2 = f2 / f2.sum() * 4.0
        k = f2[None, None].repeat(c, 1, 1, 1)
        y = F.pad(y, (2, 1, 2, 1))
        want = F.conv2d(y, k, groups=c).permute(0, 2, 3, 1).numpy()

        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_modulated_conv_matches_torch_equation(self):
        """The StyleGAN2 modconv: w'=w*s, demod by rsqrt(sum w'^2), per-
        sample grouped conv — computed naively in torch."""
        from fateavatar_tpu.completion.eg3d.networks import _modulated_conv2d

        rng = np.random.default_rng(1)
        N, I, O, H, W = 3, 5, 4, 8, 8
        x = rng.normal(size=(N, H, W, I)).astype(np.float32)
        wgt = rng.normal(size=(O, I, 3, 3)).astype(np.float32)
        sty = rng.normal(size=(N, I)).astype(np.float32) + 1.0

        got = np.asarray(_modulated_conv2d(
            jnp.asarray(x), jnp.asarray(wgt), jnp.asarray(sty)))

        xt = _t(x).permute(0, 3, 1, 2)
        wt = _t(wgt)[None] * _t(sty)[:, None, :, None, None]
        d = torch.rsqrt((wt ** 2).sum(dim=(2, 3, 4)) + 1e-8)
        wt = wt * d[:, :, None, None, None]
        outs = [F.conv2d(xt[i:i + 1], wt[i], padding=1) for i in range(N)]
        want = torch.cat(outs).permute(0, 2, 3, 1).numpy()

        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_synthesis_layer_activation_gain(self):
        """leaky_relu(0.2) * sqrt(2) — the StyleGAN2 act_gain convention."""
        from fateavatar_tpu.completion.eg3d.networks import _synthesis_layer

        p = {
            "l.affine.weight": jnp.zeros((2, 3)),
            "l.affine.bias": jnp.ones((2,)),
            "l.weight": jnp.asarray(np.eye(2)[:, :, None, None], jnp.float32),
            "l.bias": jnp.zeros((2,)),
        }
        x = jnp.asarray([[[[1.0, -1.0]]]])
        w = jnp.zeros((1, 3))
        y = np.asarray(_synthesis_layer(p, "l", x, w, noise=False))[0, 0, 0]
        # demodulated identity conv -> x unchanged; act: lrelu*sqrt(2)
        np.testing.assert_allclose(y[0], 1.0 * math.sqrt(2), rtol=1e-5)
        np.testing.assert_allclose(y[1], -0.2 * math.sqrt(2), rtol=1e-5)


class TestGFPGANPrimitives:
    def test_resize_matches_torch_bilinear(self):
        """GFPGAN-clean's F.interpolate(scale=2, bilinear,
        align_corners=False) — both up and the ResBlock's 0.5 down."""
        from fateavatar_tpu.completion.restoration import _resize

        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 6, 10, 4)).astype(np.float32)
        for factor in (2, 0.5):
            got = np.asarray(_resize(jnp.asarray(x), factor))
            want = F.interpolate(
                _t(x).permute(0, 3, 1, 2), scale_factor=factor,
                mode="bilinear", align_corners=False,
            ).permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"factor {factor}")


class TestNormOracles:
    def test_bisenet_bn_matches_torch_eval(self):
        from fateavatar_tpu.completion.segmentation import _bn

        rng = np.random.default_rng(3)
        C = 6
        p = {
            "b.weight": jnp.asarray(rng.normal(size=C), jnp.float32),
            "b.bias": jnp.asarray(rng.normal(size=C), jnp.float32),
            "b.running_mean": jnp.asarray(rng.normal(size=C), jnp.float32),
            "b.running_var": jnp.asarray(
                rng.uniform(0.5, 2.0, size=C), jnp.float32),
        }
        x = rng.normal(size=(2, 4, 4, C)).astype(np.float32)
        got = np.asarray(_bn(p, "b", jnp.asarray(x)))
        want = F.batch_norm(
            _t(x).permute(0, 3, 1, 2),
            _t(p["b.running_mean"]), _t(p["b.running_var"]),
            _t(p["b.weight"]), _t(p["b.bias"]), training=False, eps=1e-5,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_modnet_ibnorm_matches_torch(self):
        from fateavatar_tpu.completion.matting import _ibnorm

        rng = np.random.default_rng(4)
        C = 8
        half = C // 2
        p = {}
        for pre, n in (("i.bnorm", half), ("i.inorm", C - half)):
            p[f"{pre}.weight"] = jnp.asarray(rng.normal(size=n), jnp.float32)
            p[f"{pre}.bias"] = jnp.asarray(rng.normal(size=n), jnp.float32)
        p["i.bnorm.running_mean"] = jnp.asarray(
            rng.normal(size=half), jnp.float32)
        p["i.bnorm.running_var"] = jnp.asarray(
            rng.uniform(0.5, 2.0, size=half), jnp.float32)
        x = rng.normal(size=(2, 5, 5, C)).astype(np.float32)
        got = np.asarray(_ibnorm(p, "i", jnp.asarray(x)))

        xt = _t(x).permute(0, 3, 1, 2)
        bn = F.batch_norm(
            xt[:, :half], _t(p["i.bnorm.running_mean"]),
            _t(p["i.bnorm.running_var"]), _t(p["i.bnorm.weight"]),
            _t(p["i.bnorm.bias"]), training=False, eps=1e-5)
        inorm = F.instance_norm(
            xt[:, half:], weight=_t(p["i.inorm.weight"]),
            bias=_t(p["i.inorm.bias"]), eps=1e-5)
        want = torch.cat([bn, inorm], 1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestConvPaddingSemantics:
    """torch pads SYMMETRICALLY (padding=k//2); XLA's string "SAME" pads
    asymmetrically for stride>1 on even inputs — the ports must reproduce
    torch, not "SAME"."""

    @pytest.mark.parametrize("stride,size", [(1, 8), (2, 8), (2, 9)])
    def test_modnet_conv_matches_torch(self, stride, size):
        from fateavatar_tpu.completion.matting import _conv

        rng = np.random.default_rng(5)
        x = rng.normal(size=(1, size, size, 4)).astype(np.float32)
        w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
        p = {"c.weight": jnp.asarray(w)}
        got = np.asarray(_conv(p, "c", jnp.asarray(x), stride=stride))
        want = F.conv2d(_t(x).permute(0, 3, 1, 2), _t(w), stride=stride,
                        padding=1).permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("stride,size", [(1, 8), (2, 8), (2, 9)])
    def test_bisenet_conv_matches_torch(self, stride, size):
        from fateavatar_tpu.completion.segmentation import _conv

        rng = np.random.default_rng(6)
        x = rng.normal(size=(1, size, size, 4)).astype(np.float32)
        w_oihw = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
        w = jnp.transpose(jnp.asarray(w_oihw), (2, 3, 1, 0))  # HWIO
        got = np.asarray(_conv(jnp.asarray(x), w, stride=stride))
        want = F.conv2d(_t(x).permute(0, 3, 1, 2), _t(w_oihw),
                        stride=stride, padding=1).permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_vgg16_conv_matches_torch(self):
        """The perceptual-loss conv stack (NCHW, "SAME", stride 1)."""
        rng = np.random.default_rng(7)
        x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
        w = rng.normal(size=(5, 3, 3, 3)).astype(np.float32)
        b = rng.normal(size=(5,)).astype(np.float32)
        got = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(b)[None, :, None, None])
        want = F.conv2d(_t(x), _t(w), _t(b), padding=1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_vgg16_maxpool_matches_torch(self):
        from fateavatar_tpu.train.losses import _maxpool2x2

        rng = np.random.default_rng(8)
        x = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
        got = np.asarray(_maxpool2x2(jnp.asarray(x)))
        want = F.max_pool2d(_t(x), 2, 2).numpy()
        np.testing.assert_allclose(got, want, atol=0)

    def test_lpips_alex_pool_matches_torch(self):
        """alexnet's OVERLAPPING 3x3/2 maxpool (lpips.py reduce_window)."""
        rng = np.random.default_rng(9)
        x = rng.normal(size=(1, 4, 13, 13)).astype(np.float32)
        got = np.asarray(jax.lax.reduce_window(
            jnp.asarray(x), -jnp.inf, jax.lax.max,
            (1, 1, 3, 3), (1, 1, 2, 2), "VALID"))
        want = F.max_pool2d(_t(x), 3, 2).numpy()
        np.testing.assert_allclose(got, want, atol=0)
