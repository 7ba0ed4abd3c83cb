"""Mamba-1 language-model stack (the reference vendors this as infra:
`/root/reference/CrossMamba/FusionMamba/mamba_ssm/modules/mamba_simple.py`,
`models/mixer_seq_simple.py`, `utils/generation.py` — SURVEY B14).

TPU-native: the training path runs the chunked/Pallas selective scan over
the whole sequence; the decode path carries per-layer (conv_state,
ssm_state) caches through a jitted ``lax.scan`` — one compiled program for
the entire generation loop, which is the TPU equivalent of the reference's
CUDA-graph decoding cache (`utils/generation.py:244-387`).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from medical_image_classification_tpu.kernels.selective_scan import (
    selective_scan,
    selective_state_update,
)
from medical_image_classification_tpu.models.common import trunc_normal_02
from medical_image_classification_tpu.models.ss2d_modules import (
    dt_bias_init,
    torch_linear_rowmajor,
    uniform_pm,
)


@struct.dataclass
class MambaConfig:
    """`models/config_mamba.py:5-15` equivalent."""
    d_model: int = 768
    n_layer: int = 24
    vocab_size: int = 50277
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    rms_norm: bool = True
    pad_vocab_size_multiple: int = 8


def _a_log_init_1d():
    def init(rng, shape, dtype=jnp.float32):
        d, n = shape
        return jnp.broadcast_to(jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32)),
                                shape).astype(dtype)
    return init


class Mamba(nn.Module):
    """1-D Mamba block (`mamba_simple.py:31-353`): in_proj -> causal
    depthwise conv1d + SiLU -> (Δ,B,C) projection -> selective scan with
    fused SiLU(z) gate -> out_proj.  ``step`` handles one decode token."""
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    bias: bool = False
    conv_bias: bool = True

    def setup(self):
        d_inner = self.expand * self.d_model
        R = self.dt_rank or math.ceil(self.d_model / 16)
        self._d_inner, self._R = d_inner, R
        self.in_proj = nn.Dense(2 * d_inner, use_bias=self.bias,
                                kernel_init=trunc_normal_02)
        self.conv_kernel = self.param("conv1d_weight", uniform_pm(
            1.0 / math.sqrt(self.d_conv)), (self.d_conv, d_inner))
        self.conv_bias_p = (self.param("conv1d_bias", nn.initializers.zeros,
                                       (d_inner,)) if self.conv_bias else None)
        self.x_proj = nn.Dense(R + 2 * self.d_state, use_bias=False,
                               kernel_init=trunc_normal_02)
        self.dt_proj_w = self.param("dt_proj_weight", uniform_pm(R ** -0.5),
                                    (d_inner, R))
        self.dt_proj_b = self.param("dt_proj_bias", dt_bias_init(),
                                    (1, d_inner))
        self.A_log = self.param("A_log", _a_log_init_1d(),
                                (d_inner, self.d_state))
        self.Ds = self.param("D", nn.initializers.ones, (d_inner,))
        self.out_proj = nn.Dense(self.d_model, use_bias=self.bias,
                                 kernel_init=trunc_normal_02)

    def _conv(self, x):
        """Causal depthwise conv over [B, L, d_inner]."""
        k = self.d_conv
        pad = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
        out = jax.lax.conv_general_dilated(
            pad, self.conv_kernel[:, None, :], (1,), "VALID",
            dimension_numbers=("NLC", "LIO", "NLC"),
            feature_group_count=self._d_inner)
        if self.conv_bias_p is not None:
            out = out + self.conv_bias_p
        return out

    def __call__(self, x, return_state: bool = False):
        B, L, _ = x.shape
        xz = self.in_proj(x)
        xs, z = jnp.split(xz, 2, axis=-1)
        xs = jax.nn.silu(self._conv(xs))
        dbl = self.x_proj(xs)
        dt = dbl[..., :self._R] @ self.dt_proj_w.T
        Bm = dbl[..., self._R:self._R + self.d_state]
        Cm = dbl[..., self._R + self.d_state:]
        A = -jnp.exp(self.A_log.astype(jnp.float32))
        out = selective_scan(xs, dt, A, Bm, Cm, D=self.Ds, z=z,
                             delta_bias=self.dt_proj_b[0],
                             delta_softplus=True,
                             return_last_state=return_state, impl="auto")
        if return_state:
            y, last = out
        else:
            y = out
        y = self.out_proj(y.astype(x.dtype))
        if return_state:
            return y, last
        return y

    def step(self, x_t, conv_state, ssm_state):
        """One decode token (`mamba_simple.py:step`; reference K10 kernel).

        x_t: [B, d_model]; conv_state: [B, d_conv-1, d_inner];
        ssm_state: [B, d_inner, d_state]."""
        xz = self.in_proj(x_t)
        xs, z = jnp.split(xz, 2, axis=-1)
        window = jnp.concatenate([conv_state, xs[:, None]], axis=1)
        conv_out = jnp.einsum("bkd,kd->bd", window, self.conv_kernel)
        if self.conv_bias_p is not None:
            conv_out = conv_out + self.conv_bias_p
        xs_c = jax.nn.silu(conv_out)
        dbl = self.x_proj(xs_c)
        dt = dbl[..., :self._R] @ self.dt_proj_w.T
        Bm = dbl[..., self._R:self._R + self.d_state]
        Cm = dbl[..., self._R + self.d_state:]
        A = -jnp.exp(self.A_log.astype(jnp.float32))
        new_ssm, y = selective_state_update(
            ssm_state, xs_c, dt + self.dt_proj_b[0], A, Bm, Cm, D=self.Ds,
            z=z, dt_softplus=True)
        y = self.out_proj(y.astype(x_t.dtype))
        return y, window[:, 1:], new_ssm


class MambaLMBlock(nn.Module):
    """Pre-norm residual block (`modules/mamba_simple.py:297` Block)."""
    d_model: int
    d_state: int = 16
    rms_norm: bool = True

    def setup(self):
        self.norm = (nn.RMSNorm() if self.rms_norm else nn.LayerNorm())
        self.mixer = Mamba(self.d_model, d_state=self.d_state)

    def __call__(self, x):
        return x + self.mixer(self.norm(x))

    def step(self, x_t, conv_state, ssm_state):
        h, cs, ss = self.mixer.step(self.norm(x_t), conv_state, ssm_state)
        return x_t + h, cs, ss


class MambaLMHeadModel(nn.Module):
    """`models/mixer_seq_simple.py:86,176` equivalent: embedding ->
    n_layer Mamba blocks -> final norm -> tied LM head."""
    config: MambaConfig

    def setup(self):
        cfg = self.config
        vocab = cfg.vocab_size
        mult = cfg.pad_vocab_size_multiple
        if vocab % mult:
            vocab += mult - vocab % mult
        self._vocab = vocab
        self.embedding = nn.Embed(vocab, cfg.d_model,
                                  embedding_init=trunc_normal_02)
        self.blocks = [MambaLMBlock(cfg.d_model, d_state=cfg.d_state,
                                    rms_norm=cfg.rms_norm,
                                    name=f"layers_{i}")
                       for i in range(cfg.n_layer)]
        self.norm_f = nn.RMSNorm() if cfg.rms_norm else nn.LayerNorm()

    def __call__(self, input_ids):
        h = self.embedding(input_ids)
        for blk in self.blocks:
            h = blk(h)
        h = self.norm_f(h)
        return h @ self.embedding.embedding.T          # tied head

    def init_cache(self, batch: int):
        cfg = self.config
        d_inner = cfg.expand * cfg.d_model
        conv = jnp.zeros((cfg.n_layer, batch, cfg.d_conv - 1, d_inner))
        ssm = jnp.zeros((cfg.n_layer, batch, d_inner, cfg.d_state))
        return conv, ssm

    def decode_step(self, token, cache):
        """token: [B] int32 -> (logits [B, vocab], new cache)."""
        conv, ssm = cache
        h = self.embedding(token)
        new_conv, new_ssm = [], []
        for i, blk in enumerate(self.blocks):
            h, cs, ss = blk.step(h, conv[i], ssm[i])
            new_conv.append(cs)
            new_ssm.append(ss)
        h = self.norm_f(h)
        logits = h @ self.embedding.embedding.T
        return logits, (jnp.stack(new_conv), jnp.stack(new_ssm))


def generate(model, variables, prompt_ids, max_new_tokens: int = 32,
             temperature: float = 0.0, top_k: int = 0,
             rng: Optional[jax.Array] = None):
    """Autoregressive generation (reference `utils/generation.py:121-387`).

    Prefill runs the token loop through decode_step under lax.scan (keeps
    conv/ssm caches exact); the whole generation is ONE jitted program —
    the TPU stand-in for the reference's CUDA-graph decode cache.
    prompt_ids: [B, L0] int32 -> [B, L0 + max_new_tokens]."""
    B, L0 = prompt_ids.shape
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cfg = model.config
    vocab = cfg.vocab_size
    if vocab % cfg.pad_vocab_size_multiple:
        vocab += cfg.pad_vocab_size_multiple - vocab % cfg.pad_vocab_size_multiple

    def apply_step(tok, cache):
        return model.apply(variables, tok, cache, method=model.decode_step)

    @jax.jit
    def run(prompt, rng):
        cache = model.apply(variables, B, method=model.init_cache)

        def prefill_body(carry, tok):
            cache, _ = carry
            logits, cache = apply_step(tok, cache)
            return (cache, logits), None

        (cache, logits), _ = jax.lax.scan(
            prefill_body, (cache, jnp.zeros((B, vocab), jnp.float32)),
            jnp.swapaxes(prompt, 0, 1))

        def sample(logits, rng):
            if temperature == 0.0:
                return jnp.argmax(logits, -1).astype(jnp.int32)
            l = logits / temperature
            if top_k > 0:
                kth = jnp.sort(l, axis=-1)[:, -top_k][:, None]
                l = jnp.where(l < kth, -jnp.inf, l)
            return jax.random.categorical(rng, l).astype(jnp.int32)

        def gen_body(carry, _):
            cache, logits, rng = carry
            rng, sub = jax.random.split(rng)
            tok = sample(logits, sub)
            new_logits, cache = apply_step(tok, cache)
            return (cache, new_logits, rng), tok

        (_, _, _), toks = jax.lax.scan(gen_body, (cache, logits, rng),
                                       None, length=max_new_tokens)
        return jnp.swapaxes(toks, 0, 1)

    new_tokens = run(prompt_ids, rng)
    return jnp.concatenate([prompt_ids, new_tokens], axis=1)
