"""Prompt encoding stage: image_description strings → model conditioning.

The reference encodes prompts inside get_conditions (CLIP for SD 2.1,
dual-CLIP+T5 for SD 3.x, reference ctsd.py:186-253, 743-842). Here text
encoding is its own stage so it can run as a separate (sharded) program and
its outputs cache: the pipelines consume ``encoder_hidden_states`` /
``pooled_projections`` from the batch.

Tokenizers are injected (HF tokenizers need vocab files the build image
cannot fetch); any object with ``__call__(texts, max_length) -> ids`` works.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from opendwm_tpu.config import register
from opendwm_tpu.models.text_encoders import sd3_prompt_embeddings


def flatten_descriptions(desc) -> list[str]:
    """Nested (t, v) description lists → flat list (reference
    flatten_clip_text, ctsd.py:40-83)."""
    if isinstance(desc, str):
        return [desc]
    out = []
    for item in desc:
        out.extend(flatten_descriptions(item))
    return out


class WhitespaceTokenizer:
    """Minimal deterministic tokenizer for tests/smoke runs: hashed word ids
    into a fixed vocab, bos/eos framing like CLIP."""

    def __init__(self, vocab_size: int = 1000, bos: int = 0, eos: int = 2,
                 pad: int = 1):
        self.vocab_size = vocab_size
        self.bos, self.eos, self.pad = bos, eos, pad

    def __call__(self, texts: Sequence[str], max_length: int) -> np.ndarray:
        out = np.full((len(texts), max_length), self.pad, np.int32)
        for i, text in enumerate(texts):
            ids = [self.bos]
            for word in text.split()[: max_length - 2]:
                ids.append(3 + (hash(word) % (self.vocab_size - 3)))
            ids.append(self.eos)
            out[i, : len(ids)] = ids
        return out


@register("SD3TextStage")
class SD3TextStage:
    """Dual CLIP (+ optional T5) prompt encoding for the SD3 family.

    Produces batch keys with the uncond twins for CFG/dropout:
    encoder_hidden_states, pooled_projections,
    uncond_encoder_hidden_states, uncond_pooled_projections — all shaped
    (b, t, v, ...).
    """

    def __init__(
        self,
        clip_l, clip_l_params, clip_l_tokenizer,
        clip_g, clip_g_params, clip_g_tokenizer,
        t5=None, t5_params=None, t5_tokenizer=None,
        clip_max_length: int = 77,
        t5_max_length: int = 154,
        caption_dim: int = 4096,
    ):
        self.clip_l, self.clip_l_params = clip_l, clip_l_params
        self.clip_g, self.clip_g_params = clip_g, clip_g_params
        self.t5, self.t5_params = t5, t5_params
        self.tok_l, self.tok_g, self.tok_t5 = (
            clip_l_tokenizer, clip_g_tokenizer, t5_tokenizer
        )
        self.clip_max_length = clip_max_length
        self.t5_max_length = t5_max_length
        self.caption_dim = caption_dim

    def encode_flat(self, texts: list[str]):
        ids_l = jnp.asarray(self.tok_l(texts, self.clip_max_length))
        ids_g = jnp.asarray(self.tok_g(texts, self.clip_max_length))
        out_l = self.clip_l.apply(self.clip_l_params, ids_l)
        out_g = self.clip_g.apply(self.clip_g_params, ids_g)
        t5_out = None
        if self.t5 is not None:
            ids_t5 = jnp.asarray(self.tok_t5(texts, self.t5_max_length))
            t5_out = self.t5.apply(self.t5_params, ids_t5)
        return sd3_prompt_embeddings(
            out_l, out_g, t5_out, caption_dim=self.caption_dim
        )

    def __call__(self, batch: dict) -> dict:
        """Reads batch['image_description'] (b, t, v nested strings)."""
        desc = batch["image_description"]
        b = len(desc)
        t = len(desc[0])
        v = len(desc[0][0]) if isinstance(desc[0][0], list) else 1
        flat = flatten_descriptions(desc)
        tokens, pooled = self.encode_flat(flat)
        uncond_tokens, uncond_pooled = self.encode_flat([""] * len(flat))
        shape = (b, t, v)
        out = dict(batch)
        out["encoder_hidden_states"] = tokens.reshape(
            shape + tokens.shape[1:]
        )
        out["pooled_projections"] = pooled.reshape(shape + pooled.shape[1:])
        out["uncond_encoder_hidden_states"] = uncond_tokens.reshape(
            shape + tokens.shape[1:]
        )
        out["uncond_pooled_projections"] = uncond_pooled.reshape(
            shape + pooled.shape[1:]
        )
        return out


@register("CLIPTextStage")
class CLIPTextStage:
    """Single-CLIP prompt encoding for the SD 2.1 family (penultimate hidden
    states, reference ctsd.py:186-216)."""

    def __init__(self, clip, clip_params, tokenizer, max_length: int = 77,
                 hidden_state_index: int = -2):
        self.clip, self.clip_params = clip, clip_params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.hidden_state_index = hidden_state_index

    def encode_flat(self, texts: list[str]):
        ids = jnp.asarray(self.tokenizer(texts, self.max_length))
        _, _, hidden = self.clip.apply(self.clip_params, ids)
        return hidden[self.hidden_state_index]

    def __call__(self, batch: dict) -> dict:
        desc = batch["image_description"]
        b = len(desc)
        t = len(desc[0])
        v = len(desc[0][0]) if isinstance(desc[0][0], list) else 1
        flat = flatten_descriptions(desc)
        emb = self.encode_flat(flat)
        uncond = self.encode_flat([""] * len(flat))
        out = dict(batch)
        out["encoder_hidden_states"] = emb.reshape((b, t, v) + emb.shape[1:])
        out["uncond_encoder_hidden_states"] = uncond.reshape(
            (b, t, v) + emb.shape[1:]
        )
        return out
