"""Torch-checkpoint importer test: a synthetic reference-schema state_dict
must land exactly on the Flax param structure and run."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.utils.torch_import import (
    import_medmamba_state_dict,
)

DEPTHS, DIMS, DSTATE = (1, 1), (16, 32), 4


def _synthetic_state_dict():
    """Build a state_dict with the reference's exact keys/shapes
    (MedMamba.py:146-767 naming) filled with random values."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def add(name, *shape):
        sd[name] = torch.randn(*shape, generator=g)

    add("patch_embed.proj.weight", DIMS[0], 3, 4, 4)
    add("patch_embed.proj.bias", DIMS[0])
    add("patch_embed.norm.weight", DIMS[0])
    add("patch_embed.norm.bias", DIMS[0])
    for i, depth in enumerate(DEPTHS):
        dim = DIMS[i]
        half = dim // 2
        d_inner = 2 * half
        R = max(1, int(np.ceil(half / 16)))
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            add(p + ".ln_1.weight", half)
            add(p + ".ln_1.bias", half)
            sa = p + ".self_attention"
            add(sa + ".in_proj.weight", 2 * d_inner, half)
            add(sa + ".conv2d.weight", d_inner, 1, 3, 3)
            add(sa + ".conv2d.bias", d_inner)
            add(sa + ".x_proj_weight", 4, R + 2 * DSTATE, d_inner)
            add(sa + ".dt_projs_weight", 4, d_inner, R)
            add(sa + ".dt_projs_bias", 4, d_inner)
            add(sa + ".A_logs", 4 * d_inner, DSTATE)
            add(sa + ".Ds", 4 * d_inner)
            add(sa + ".out_norm.weight", d_inner)
            add(sa + ".out_norm.bias", d_inner)
            add(sa + ".out_proj.weight", half, d_inner)
            cb = p + ".conv33conv33conv11"
            for bn_idx in (0, 2, 5):
                add(f"{cb}.{bn_idx}.weight", half)
                add(f"{cb}.{bn_idx}.bias", half)
                add(f"{cb}.{bn_idx}.running_mean", half)
                sd[f"{cb}.{bn_idx}.running_var"] = torch.rand(
                    half, generator=g) + 0.5
            add(cb + ".1.weight", half, half, 3, 3)
            add(cb + ".1.bias", half)
            add(cb + ".4.weight", half, half, 3, 3)
            add(cb + ".4.bias", half)
            add(cb + ".7.weight", half, half, 1, 1)
            add(cb + ".7.bias", half)
        if i < len(DEPTHS) - 1:
            add(f"layers.{i}.downsample.norm.weight", 4 * dim)
            add(f"layers.{i}.downsample.norm.bias", 4 * dim)
            add(f"layers.{i}.downsample.reduction.weight", 2 * dim, 4 * dim)
    add("head.weight", 5, DIMS[-1])
    add("head.bias", 5)
    return sd


def test_import_structure_matches_flax_init():
    sd = _synthetic_state_dict()
    params, stats = import_medmamba_state_dict(
        sd, depths=DEPTHS, dims=DIMS, d_state=DSTATE)

    model = create_model("medmamba", num_classes=5, depths=DEPTHS, dims=DIMS,
                         d_state=DSTATE, drop_path_rate=0.0)
    x = jnp.ones((1, 32, 32, 3))
    ref = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    # identical treedefs + shapes
    ref_flat = jax.tree_util.tree_flatten_with_path(ref["params"])[0]
    got_flat = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(jnp.asarray, params))[0]
    ref_map = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
    got_map = {jax.tree_util.keystr(k): np.asarray(v).shape
               for k, v in got_flat}
    assert ref_map == got_map, set(ref_map) ^ set(got_map)

    # imported model runs
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": _as_stats(ref["batch_stats"], stats)}
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


def _as_stats(ref_stats, imported):
    """Overlay imported BN stats onto the init batch_stats structure."""
    import jax

    def merge(a, b):
        if not isinstance(a, dict) or "mean" in a:
            return jnp.asarray(b) if not isinstance(b, dict) else \
                {k: jnp.asarray(v) for k, v in b.items()}
        return {k: merge(v, b[k]) if isinstance(b, dict) and k in b else v
                for k, v in a.items()}

    import flax
    a = flax.core.unfreeze(ref_stats)
    return merge(a, imported)


def test_medssd_import_structure():
    """SSD-family importer: synthetic reference-schema dict -> Flax tree."""
    from medical_image_classification_tpu.utils.torch_import import (
        import_medssd_state_dict)
    depths, dims, hd = (1, 1), (16, 32), 8
    g = torch.Generator().manual_seed(1)
    sd = {}

    def add(name, *shape):
        sd[name] = torch.randn(*shape, generator=g)

    add("patch_embed.proj.weight", dims[0], 3, 4, 4)
    add("patch_embed.proj.bias", dims[0])
    add("patch_embed.norm.weight", dims[0])
    add("patch_embed.norm.bias", dims[0])
    dstate = 8
    for i, depth in enumerate(depths):
        dim = dims[i]
        half = dim // 2
        d_inner = 2 * half
        nheads = d_inner // hd
        d_in_proj = 2 * d_inner + 2 * dstate + nheads
        conv_dim = d_inner + 2 * dstate + nheads
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            add(p + ".ln_1.weight", half)
            add(p + ".ln_1.bias", half)
            sa = p + ".self_attention"
            add(sa + ".in_proj.weight", d_in_proj, half)
            add(sa + ".conv2d.weight", conv_dim, 1, 3, 3)
            add(sa + ".conv2d.bias", conv_dim)
            add(sa + ".dt_bias", 4, nheads)
            add(sa + ".A_logs", 4 * nheads)
            add(sa + ".Ds", 4 * nheads)
            add(sa + ".norm.weight", d_inner)
            add(sa + ".out_proj.weight", half, d_inner)
            cb = p + ".conv33conv33conv11"
            for bn_idx in (0, 2, 5):
                add(f"{cb}.{bn_idx}.weight", half)
                add(f"{cb}.{bn_idx}.bias", half)
                add(f"{cb}.{bn_idx}.running_mean", half)
                sd[f"{cb}.{bn_idx}.running_var"] = torch.rand(
                    half, generator=g) + 0.5
            add(cb + ".1.weight", half, half, 3, 3)
            add(cb + ".1.bias", half)
            add(cb + ".4.weight", half, half, 3, 3)
            add(cb + ".4.bias", half)
            add(cb + ".7.weight", half, half, 1, 1)
            add(cb + ".7.bias", half)
        if i < len(depths) - 1:
            add(f"layers.{i}.downsample.norm.weight", 4 * dim)
            add(f"layers.{i}.downsample.norm.bias", 4 * dim)
            add(f"layers.{i}.downsample.reduction.weight", 2 * dim, 4 * dim)
    add("head.weight", 5, dims[-1])
    add("head.bias", 5)

    params, stats = import_medssd_state_dict(
        sd, depths=depths, dims=dims, headdim=hd)
    model = create_model("medssd", num_classes=5, depths=depths, dims=dims,
                         d_state=8, ssd_headdim=hd, drop_path_rate=0.0)
    x = jnp.ones((1, 32, 32, 3))
    ref = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref_map = {jax.tree_util.keystr(k): v.shape for k, v in
               jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
    got_map = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
               jax.tree_util.tree_flatten_with_path(
                   jax.tree_util.tree_map(jnp.asarray, params))[0]}
    assert ref_map == got_map, set(ref_map) ^ set(got_map)


def test_mamba_lm_import_structure():
    from medical_image_classification_tpu.utils.torch_import import (
        import_mamba_lm_state_dict)
    from medical_image_classification_tpu.models.mamba_lm import (
        MambaConfig, MambaLMHeadModel)
    cfg = MambaConfig(d_model=16, n_layer=2, vocab_size=48, d_state=4,
                      pad_vocab_size_multiple=8)
    d_inner = 2 * cfg.d_model
    R = 1
    g = torch.Generator().manual_seed(2)
    sd = {}

    def add(name, *shape):
        sd[name] = torch.randn(*shape, generator=g)

    add("backbone.embedding.weight", 48, cfg.d_model)
    add("backbone.norm_f.weight", cfg.d_model)
    for i in range(cfg.n_layer):
        p = f"backbone.layers.{i}"
        add(p + ".norm.weight", cfg.d_model)
        add(p + ".mixer.in_proj.weight", 2 * d_inner, cfg.d_model)
        add(p + ".mixer.conv1d.weight", d_inner, 1, cfg.d_conv)
        add(p + ".mixer.conv1d.bias", d_inner)
        add(p + ".mixer.x_proj.weight", R + 2 * cfg.d_state, d_inner)
        add(p + ".mixer.dt_proj.weight", d_inner, R)
        add(p + ".mixer.dt_proj.bias", d_inner)
        add(p + ".mixer.A_log", d_inner, cfg.d_state)
        add(p + ".mixer.D", d_inner)
        add(p + ".mixer.out_proj.weight", cfg.d_model, d_inner)
    params = import_mamba_lm_state_dict(sd, n_layer=cfg.n_layer)

    model = MambaLMHeadModel(cfg)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    ref = model.init({"params": jax.random.PRNGKey(0)}, ids)
    ref_map = {jax.tree_util.keystr(k): v.shape for k, v in
               jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
    got_map = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
               jax.tree_util.tree_flatten_with_path(
                   jax.tree_util.tree_map(jnp.asarray, params))[0]}
    # embedding padded to vocab multiple: allow that one shape to differ
    emb_key = "['embedding']['embedding']"
    assert set(ref_map) == set(got_map), set(ref_map) ^ set(got_map)
    for kk in ref_map:
        if kk == emb_key:
            continue
        assert ref_map[kk] == got_map[kk], (kk, ref_map[kk], got_map[kk])
