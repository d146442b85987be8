"""NAFNet baseline ("Simple Baselines for Image Restoration", Chen et al.
2022) — the comparison model the reference vendors
(/root/reference/src/admmtor/modelbuild/nafnet.py:126-281), re-implemented
as Flax modules on NCHW.

Includes the TLSC test-time local-statistics conversion ("Revisiting Global
Statistics Aggregation...", Chu et al. 2021): ``NAFNetLocal`` swaps the
simplified channel attention's global average pool for a cumsum-based local
average pool. Kernel-size semantics match the reference exactly: its
``AvgPool2d.forward`` formula ``kernel = x.shape * base // train``
(nafnet.py:43-46) is evaluated ONCE — during ``Local_Base.convert``'s
calibration forward with a *train-size* input (nafnet.py:114-117) — and
then cached on the module, so the effective kernel is the static
``train_feature_at_level * int(1.5*train) // train`` regardless of the
inference input size. ``_sca_kernel`` reproduces that calibration
arithmetic (including the divisibility padding of ``check_image_size``,
nafnet.py:263-268); configuration is declarative (``train_size``) rather
than runtime module surgery (replace_layers, nafnet.py:91-100) — same
math, jit-friendly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.layers_common import (
    Conv2d,
    LayerNorm2d,
    adaptive_avg_pool2d_1,
    pixel_shuffle,
)


def simple_gate(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=1)
    return x1 * x2


def local_avg_pool2d(x: jnp.ndarray, kernel: Tuple[int, int]) -> jnp.ndarray:
    """TLSC local average pool via 2D cumulative sums, replicate-padded back
    to the input size (nafnet.py:75-90, the exact non-fast path)."""
    _, _, h, w = x.shape
    k1, k2 = min(h, kernel[0]), min(w, kernel[1])
    s = jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)
    s = jnp.pad(s, ((0, 0), (0, 0), (1, 0), (1, 0)))
    s1 = s[:, :, :-k1, :-k2]
    s2 = s[:, :, :-k1, k2:]
    s3 = s[:, :, k1:, :-k2]
    s4 = s[:, :, k1:, k2:]
    out = (s4 + s1 - s2 - s3) / (k1 * k2)
    _, _, oh, ow = out.shape
    pad = ((w - ow) // 2, (w - ow + 1) // 2, (h - oh) // 2, (h - oh + 1) // 2)
    return jnp.pad(
        out, ((0, 0), (0, 0), (pad[2], pad[3]), (pad[0], pad[1])), mode="edge"
    )


class NAFBlock(nn.Module):
    c: int
    dw_expand: int = 2
    ffn_expand: int = 2
    drop_out_rate: float = 0.0
    # TLSC: when set, SCA pools locally with this kernel (the calibration-
    # cached size NAFNet._sca_kernel computes) instead of globally
    sca_local_kernel: Optional[Tuple[int, int]] = None
    deterministic: bool = True

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        c = self.c
        dw = c * self.dw_expand
        x = LayerNorm2d(c, name="norm1")(inp)
        x = Conv2d(c, dw, 1, name="conv1")(x)
        x = Conv2d(dw, dw, 3, padding=1, groups=dw, name="conv2")(x)
        x = simple_gate(x)
        # simplified channel attention; global pool unless the TLSC kernel is
        # strictly smaller than the feature map (reference nafnet.py:53-54)
        kernel = self.sca_local_kernel
        if kernel is not None and (kernel[0] < x.shape[-2] or kernel[1] < x.shape[-1]):
            pooled = local_avg_pool2d(x, kernel)
        else:
            pooled = adaptive_avg_pool2d_1(x)
        sca = Conv2d(dw // 2, dw // 2, 1, name="sca_conv")(pooled)
        x = x * sca
        x = Conv2d(dw // 2, c, 1, name="conv3")(x)
        if self.drop_out_rate > 0:
            x = nn.Dropout(self.drop_out_rate, deterministic=self.deterministic)(x)
        beta = self.param("beta", nn.initializers.zeros, (1, c, 1, 1), jnp.float32)
        y = inp + x * beta

        x = LayerNorm2d(c, name="norm2")(y)
        x = Conv2d(c, self.ffn_expand * c, 1, name="conv4")(x)
        x = simple_gate(x)
        x = Conv2d(self.ffn_expand * c // 2, c, 1, name="conv5")(x)
        if self.drop_out_rate > 0:
            x = nn.Dropout(self.drop_out_rate, deterministic=self.deterministic)(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1, c, 1, 1), jnp.float32)
        return y + x * gamma


class NAFNet(nn.Module):
    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    # TLSC (NAFNetLocal): train crop size (h, w); None = plain NAFNet
    train_size: Optional[Tuple[int, int]] = None
    tlsc_ratio: float = 1.5

    def _sca_kernel(self, level: int) -> Optional[Tuple[int, int]]:
        """The TLSC pool kernel a block at ``level`` uses — bit-exact to the
        reference's calibration: ``Local_Base.convert`` runs one train-size
        forward (nafnet.py:114-117); each ``AvgPool2d`` evaluates
        ``kernel = x.shape * base // train`` with x at the calibration
        feature resolution (``padded_train / 2^level``, after
        ``check_image_size`` divisibility padding) and caches the result
        (nafnet.py:40-46), so inference at any size reuses this kernel."""
        if self.train_size is None:
            return None
        th, tw = self.train_size
        padder = 2 ** len(self.enc_blk_nums)
        pth = th + (padder - th % padder) % padder
        ptw = tw + (padder - tw % padder) % padder
        base = (int(th * self.tlsc_ratio), int(tw * self.tlsc_ratio))
        feat = (pth // (2**level), ptw // (2**level))
        return (feat[0] * base[0] // th, feat[1] * base[1] // tw)

    @nn.compact
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = inp.shape
        padder = 2 ** len(self.enc_blk_nums)
        ph = (padder - h % padder) % padder
        pw = (padder - w % padder) % padder
        x = jnp.pad(inp, ((0, 0), (0, 0), (0, ph), (0, pw)))
        padded = x

        x = Conv2d(self.img_channel, self.width, 3, padding=1, name="intro")(x)

        chan = self.width
        encs = []
        for li, num in enumerate(self.enc_blk_nums):
            for bi in range(num):
                x = NAFBlock(
                    chan, sca_local_kernel=self._sca_kernel(li), name=f"enc_{li}_{bi}"
                )(x)
            encs.append(x)
            x = Conv2d(chan, 2 * chan, 2, stride=2, name=f"down_{li}")(x)
            chan *= 2

        for bi in range(self.middle_blk_num):
            x = NAFBlock(
                chan,
                sca_local_kernel=self._sca_kernel(len(self.enc_blk_nums)),
                name=f"middle_{bi}",
            )(x)

        for li, num in enumerate(self.dec_blk_nums):
            x = Conv2d(chan, chan * 2, 1, use_bias=False, name=f"up_{li}")(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + encs[::-1][li]
            level = len(self.enc_blk_nums) - 1 - li
            for bi in range(num):
                x = NAFBlock(
                    chan, sca_local_kernel=self._sca_kernel(level), name=f"dec_{li}_{bi}"
                )(x)

        x = Conv2d(self.width, self.img_channel, 3, padding=1, name="ending")(x)
        x = x + padded
        return x[:, :, :h, :w]


def NAFNetLocal(
    train_size: Tuple[int, int] = (256, 256), **kwargs
) -> NAFNet:
    """NAFNet with TLSC local statistics for large-image inference
    (nafnet.py:271-281)."""
    return NAFNet(train_size=train_size, **kwargs)
