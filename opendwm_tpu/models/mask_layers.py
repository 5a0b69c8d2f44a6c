"""MaskGWM masked-reconstruction module (MAE-style, paper MaskGWM).

Capability parity with reference src/dwm/models/mask_layers.py: during
diffusion training a ratio of latent tokens is dropped before the DiT blocks
(``random_masking`` :433-530, 'constant' and 'rand_t' noise modes), and at
the first decoder layer the dropped positions are re-injected as mask tokens
carrying 3-D sincos positions (MaskPatchEmbed :236-277) and refined by a
side interpolator of t2i-modulated STDiT3 blocks with a masked shortcut
(``mask_reconstruction`` :391-431, STDiT3Block :101-235).

Static shapes throughout: ``len_keep = L*(1-mask_ratio)`` is a Python int,
drops/restores are take_along_axis/scatter with precomputed index tensors.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register
from opendwm_tpu.models.layers import FeedForward, sincos_pos_embed_2d
from opendwm_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


def sincos_pos_embed_3d(
    embed_dim: int, t: int, h: int, w: int,
    spatial_scale: float = 1.0, temporal_scale: float = 1.0,
) -> np.ndarray:
    """3-D (temporal+spatial) sincos table, (t, h*w, embed_dim)."""
    spatial_dim = embed_dim // 4 * 3
    temporal_dim = embed_dim - spatial_dim
    spatial = sincos_pos_embed_2d(
        spatial_dim, (h, w), base_size=h, interpolation_scale=spatial_scale
    )  # (h*w, sd)
    pos_t = np.arange(t, dtype=np.float64) / temporal_scale
    omega = 1.0 / 10000 ** (
        np.arange(temporal_dim // 2, dtype=np.float64)
        / (temporal_dim / 2)
    )
    out = np.einsum("t,d->td", pos_t, omega)
    temporal = np.concatenate([np.sin(out), np.cos(out)], axis=1)
    emb = np.concatenate(
        [
            np.broadcast_to(temporal[:, None, :], (t, h * w, temporal_dim)),
            np.broadcast_to(spatial[None], (t, h * w, spatial_dim)),
        ],
        axis=-1,
    )
    return emb.astype(np.float32)


class STDiT3Block(nn.Module):
    """t2i-modulated transformer block (self-attn → cross-attn → MLP), the
    side-interpolator unit (reference mask_layers.py:101-235)."""

    heads: int
    head_dim: int
    temporal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,          # (b, n, c)
        y: Optional[jax.Array],  # (b, ly, c) cross-attention context
        t_mlp: jax.Array,      # (b, 6*c) modulation
        T: int,
        S: int,
    ) -> jax.Array:
        c = x.shape[-1]
        scale_shift_table = self.param(
            "scale_shift_table",
            lambda key: jax.random.normal(key, (6, c)) / c**0.5,
        )
        mods = scale_shift_table[None] + t_mlp.reshape(-1, 6, c)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mods[:, i][:, None] for i in range(6)
        )

        normed = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype
        )(x)
        xm = normed * (1 + scale_msa) + shift_msa

        b = x.shape[0]
        if self.temporal:
            xm = xm.reshape(b, T, S, c).transpose(0, 2, 1, 3)
            xm = xm.reshape(b * S, T, c)
        else:
            xm = xm.reshape(b * T, S, c)

        def heads_of(z):
            return z.reshape(z.shape[0], z.shape[1], self.heads,
                             self.head_dim)

        q = heads_of(nn.Dense(c, dtype=self.dtype, name="attn_q")(xm))
        k = heads_of(nn.Dense(c, dtype=self.dtype, name="attn_k")(xm))
        v = heads_of(nn.Dense(c, dtype=self.dtype, name="attn_v")(xm))
        attn = dot_product_attention(q, k, v)
        attn = attn.reshape(xm.shape[0], xm.shape[1], c)
        attn = nn.Dense(c, dtype=self.dtype, name="attn_out")(attn)
        if self.temporal:
            attn = attn.reshape(b, S, T, c).transpose(0, 2, 1, 3)
        attn = attn.reshape(b, T * S, c)
        x = x + gate_msa * attn

        if y is not None:
            q = heads_of(nn.Dense(c, dtype=self.dtype, name="cross_q")(x))
            k = heads_of(nn.Dense(c, dtype=self.dtype, name="cross_k")(y))
            v = heads_of(nn.Dense(c, dtype=self.dtype, name="cross_v")(y))
            ca = dot_product_attention(q, k, v).reshape(b, T * S, c)
            x = x + nn.Dense(c, dtype=self.dtype, name="cross_out")(ca)

        normed = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype
        )(x)
        xm = normed * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * FeedForward(
            activation="gelu-approximate", dtype=self.dtype, name="mlp"
        )(xm)
        return x


@register("MaskController", aliases=("dwm.models.mask_layers.MaskController",))
class MaskController(nn.Module):
    """See module docstring.

    Call protocol (used by the DiT):
      x_drop, metas = controller.random_masking(rng, x, h, w)
      ...main blocks run on the shortened sequence...
      x_full = controller.mask_reconstruction(x_drop_processed, metas, ...)
    """

    hidden_size: int = 1536
    num_heads: int = 24
    attention_head_dim: int = 64
    decode_layer: int = 5
    interpolater_layer: int = 1
    mask_ratio: float = 0.25
    mae_mask_type: str = "constant"  # constant | rand_t
    forward_mix_interpolater: bool = False
    dtype: Any = jnp.float32

    def is_first_decoder_layer(self, index_block: int, num_blocks: int):
        return index_block == (num_blocks - self.decode_layer)

    @nn.compact
    def __call__(self, *args, method: str = "mask", **kwargs):
        raise NotImplementedError(
            "Use .random_masking / .mask_reconstruction via nn.apply"
        )

    def _len_keep(self, l: int) -> int:
        return int(l * (1 - self.mask_ratio))

    @nn.nowrap
    def make_mask_ids(self, rng: jax.Array, n: int, t: int, l: int):
        """ids_keep (n*t, len_keep), ids_drop (n*t, l-len_keep),
        ids_restore (n*t, l), mask (n, t, l) with 1 at dropped positions."""
        len_keep = self._len_keep(l)
        if self.mae_mask_type == "rand_t":
            noise = jax.random.uniform(rng, (n, t, l))
        else:  # constant: same mask across frames
            noise = jnp.broadcast_to(
                jax.random.uniform(rng, (n, 1, l)), (n, t, l)
            )
        noise = noise.reshape(n * t, l)
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        ids_drop = ids_shuffle[:, len_keep:]
        mask = jnp.ones((n * t, l)).at[
            jnp.arange(n * t)[:, None], ids_keep
        ].set(0.0)
        return ids_keep, ids_drop, ids_restore, mask.reshape(n, t, l)

    def random_masking(
        self, rng: jax.Array, x: jax.Array, h: int, w: int,
        condition_residuals: Optional[list] = None,
    ):
        """x: (n, t, l, c) tokens → (n, t, len_keep, c) + metas. Condition
        residuals (token-aligned) are dropped identically."""
        n, t, l, c = x.shape
        ids_keep, ids_drop, ids_restore, mask = self.make_mask_ids(
            rng, n, t, l
        )
        flat = x.reshape(n * t, l, c)
        x_keep = jnp.take_along_axis(flat, ids_keep[..., None], axis=1)
        new_residuals = None
        if condition_residuals is not None:
            new_residuals = [
                jnp.take_along_axis(
                    r.reshape(n * t, l, r.shape[-1]), ids_keep[..., None],
                    axis=1,
                ).reshape(n, t, -1, r.shape[-1])
                for r in condition_residuals
            ]
        metas = {
            "ids_keep": ids_keep,
            "ids_drop": ids_drop,
            "ids_restore": ids_restore,
            "mask": mask,
            "grid": (h, w),
        }
        return x_keep.reshape(n, t, -1, c), metas, new_residuals

    @nn.compact
    def mask_reconstruction(
        self,
        x: jax.Array,            # (n, t, len_keep, c) processed visible tokens
        metas: dict,
        y: Optional[jax.Array],  # (n, ly, c) text context
        temb: jax.Array,         # (n*t, c) or (n, c)
    ) -> jax.Array:
        n, t, len_keep, c = x.shape
        h, w = metas["grid"]
        l = h * w
        ids_restore = metas["ids_restore"]
        ids_drop = metas["ids_drop"]
        mask = metas["mask"]

        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, c)
        )
        # 3-D positions for the dropped slots (MaskPatchEmbed, merge 'add')
        pos = jnp.asarray(sincos_pos_embed_3d(c, t, h, w))  # (t, l, c)
        pos = jnp.broadcast_to(pos[None], (n, t, l, c)).reshape(n * t, l, c)
        pos_drop = jnp.take_along_axis(pos, ids_drop[..., None], axis=1)
        mask_tokens = mask_token + nn.Dense(
            c, dtype=self.dtype, name="mask_pos_proj"
        )(pos_drop.astype(self.dtype))

        # restore full-length sequence: visible tokens then mask tokens,
        # unshuffled by ids_restore
        flat = x.reshape(n * t, len_keep, c)
        combined = jnp.concatenate([flat, mask_tokens], axis=1)
        full = jnp.take_along_axis(combined, ids_restore[..., None], axis=1)
        x_before = full.reshape(n, t, l, c)

        if temb.shape[0] == n:
            temb = jnp.repeat(temb, t, axis=0)
        t_mlp = nn.Dense(
            6 * c, dtype=self.dtype, name="t_block"
        )(nn.silu(temb.astype(self.dtype)))
        # modulate per (n, t): collapse to per-n by mean (single temb per
        # sample stream, matching the reference's v-first collapse)
        t_mlp = t_mlp.reshape(n, t, -1).mean(axis=1)

        z = x_before.reshape(n, t * l, c)
        for i in range(self.interpolater_layer):
            z = STDiT3Block(
                heads=self.num_heads, head_dim=self.attention_head_dim,
                dtype=self.dtype, name=f"sideblocks_{i}",
            )(z, y, t_mlp, t, l)
            if self.forward_mix_interpolater:
                zt = STDiT3Block(
                    heads=self.num_heads, head_dim=self.attention_head_dim,
                    temporal=True, dtype=self.dtype,
                    name=f"temporal_sideblocks_{i}",
                )(z, y, t_mlp, t, l)
                z = 0.5 * z + 0.5 * zt

        z = z.reshape(n, t, l, c)
        # masked shortcut: only reconstructed (dropped) positions take the
        # side-interpolator output
        m = mask[..., None]
        return z * m + x_before * (1 - m)
