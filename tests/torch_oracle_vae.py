"""Independent torch oracle of the diffusers AutoencoderKL.

Implements the SD VAE encoder/decoder math (diffusers 0.31 AutoencoderKL,
loaded by the reference at src/dwm/pipelines/ctsd.py:952-964) directly in
torch — no diffusers import — with the exact diffusers state-dict key
names, so ``convert.torch_import.convert_autoencoder_kl`` consumes its
``state_dict()`` unchanged and numeric conversion parity can be asserted
in this environment (diffusers is not installable here; docs/PARITY.md).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(32, in_ch), in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(min(32, out_ch), out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class AttnBlock(nn.Module):
    """diffusers Attention(heads=1) as used in the VAE mid block."""

    def __init__(self, ch: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(min(32, ch), ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        logits = torch.einsum("bqc,bkc->bqk", q.float(), k.float())
        probs = torch.softmax(logits * c ** -0.5, dim=-1).to(v.dtype)
        y = torch.einsum("bqk,bkc->bqc", probs, v)
        y = self.to_out[0](y)
        return x + y.transpose(1, 2).reshape(b, c, h, w)


class Downsample(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Mid(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock(ch, ch),
                                      ResnetBlock(ch, ch)])
        self.attentions = nn.ModuleList([AttnBlock(ch)])

    def forward(self, h):
        h = self.resnets[0](h)
        h = self.attentions[0](h)
        return self.resnets[1](h)


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(in_ch if j == 0 else out_ch, out_ch)
             for j in range(layers)]
        )
        self.downsamplers = (
            None if last else nn.ModuleList([Downsample(out_ch)])
        )

    def forward(self, h):
        for r in self.resnets:
            h = r(h)
        if self.downsamplers is not None:
            h = self.downsamplers[0](h)
        return h


class _UpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(in_ch if j == 0 else out_ch, out_ch)
             for j in range(layers)]
        )
        self.upsamplers = None if last else nn.ModuleList([Upsample(out_ch)])

    def forward(self, h):
        for r in self.resnets:
            h = r(h)
        if self.upsamplers is not None:
            h = self.upsamplers[0](h)
        return h


class Encoder(nn.Module):
    def __init__(self, chans, layers, latent_ch, double_z=True):
        super().__init__()
        self.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        blocks = []
        for i, ch in enumerate(chans):
            blocks.append(_DownBlock(
                chans[i - 1] if i else chans[0], ch, layers,
                last=i == len(chans) - 1,
            ))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = _Mid(chans[-1])
        self.conv_norm_out = nn.GroupNorm(
            min(32, chans[-1]), chans[-1], eps=1e-6
        )
        out_ch = latent_ch * (2 if double_z else 1)
        self.conv_out = nn.Conv2d(chans[-1], out_ch, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class Decoder(nn.Module):
    def __init__(self, chans, layers, latent_ch, out_ch=3):
        super().__init__()
        rev = list(reversed(chans))
        self.conv_in = nn.Conv2d(latent_ch, rev[0], 3, padding=1)
        self.mid_block = _Mid(rev[0])
        blocks = []
        for i, ch in enumerate(rev):
            blocks.append(_UpBlock(
                rev[i - 1] if i else rev[0], ch, layers,
                last=i == len(rev) - 1,
            ))
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(min(32, rev[-1]), rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], out_ch, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for blk in self.up_blocks:
            h = blk(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class AutoencoderKLOracle(nn.Module):
    """Forward: x (B, 3, H, W) -> (recon, mean, logvar), posterior mean."""

    def __init__(self, chans=(32, 64), enc_layers=2, dec_layers=3,
                 latent_ch=4, use_quant_conv=True):
        super().__init__()
        self.encoder = Encoder(chans, enc_layers, latent_ch)
        self.decoder = Decoder(chans, dec_layers, latent_ch)
        self.use_quant_conv = use_quant_conv
        if use_quant_conv:
            self.quant_conv = nn.Conv2d(2 * latent_ch, 2 * latent_ch, 1)
            self.post_quant_conv = nn.Conv2d(latent_ch, latent_ch, 1)

    def forward(self, x):
        moments = self.encoder(x)
        if self.use_quant_conv:
            moments = self.quant_conv(moments)
        mean, logvar = torch.chunk(moments, 2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        z = mean
        if self.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z), mean, logvar
