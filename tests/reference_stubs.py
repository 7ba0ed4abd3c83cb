"""Stubs that let the reference PyTorch models run on CPU for parity tests.

The reference imports `timm` and `mamba_ssm` (CUDA/Triton); neither is
installed here.  This module installs minimal CPU stand-ins into
``sys.modules`` so `/root/reference/MedMamba.py` and `/root/reference/SSD/
MedSSD.py` can be imported and executed as the golden reference.

The scan implementations below are written from the selective-scan /
SSD recurrence definitions (the same math as this repo's
``kernels/selective_scan.py::selective_scan_xla`` and ``kernels/ssd.py``),
NOT copied from the reference's `selective_scan_interface.py:92-158` —
they are straightforward sequential recurrences in torch.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn as tnn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# sequential torch recurrences (the golden math)
# ---------------------------------------------------------------------------

def selective_scan_sequential(u, delta, A, B, C, D=None, z=None,
                              delta_bias=None, delta_softplus=False,
                              return_last_state=False):
    """x_t = exp(Δt·A)·x_{t-1} + Δt·B_t·u_t ; y_t = C_t·x_t (+ D·u, silu-z).

    u/delta: [B, D, L]; A: [D, N]; B/C: [B, G, N, L] (grouped) or [B, N, L];
    D/delta_bias: [D].  Returns y [B, D, L] (+ last state [B, D, N]).
    """
    dtype_in = u.dtype
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias.float()[None, :, None]
    if delta_softplus:
        delta = F.softplus(delta)
    Bsz, Dd, L = u.shape
    if B.dim() == 3:
        B = B.unsqueeze(1)
        C = C.unsqueeze(1)
    G = B.shape[1]
    rep = Dd // G
    Bc = B.float().repeat_interleave(rep, dim=1)          # [B, D, N, L]
    Cc = C.float().repeat_interleave(rep, dim=1)
    dA = torch.exp(delta.unsqueeze(2) * A.float()[None, :, :, None])
    dBu = delta.unsqueeze(2) * Bc * u.unsqueeze(2)        # [B, D, N, L]
    x = u.new_zeros(Bsz, Dd, A.shape[1])
    ys = []
    for t in range(L):
        x = dA[..., t] * x + dBu[..., t]
        ys.append((x * Cc[..., t]).sum(-1))
    y = torch.stack(ys, dim=-1)                           # [B, D, L]
    if D is not None:
        y = y + u * D.float()[None, :, None]
    if z is not None:
        y = y * F.silu(z.float())
    y = y.to(dtype_in)
    return (y, x) if return_last_state else y


def mamba_chunk_scan_sequential(x, dt, A, B, C, chunk_size=256, D=None,
                                z=None, dt_bias=None, dt_softplus=True,
                                seq_idx=None, cu_seqlens=None, **kw):
    """Mamba-2 scan, sequential reference (chunk_size irrelevant to the math).

    x: [b, l, h, p]; dt: [b, l, h]; A: [h]; B/C: [b, l, g, n];
    D: [h] or [h, p]; dt_bias: [h].  Returns y [b, l, h, p].
    """
    b, l, h, p = x.shape
    g = B.shape[2]
    xf = x.float()
    dt = dt.float()
    if dt_bias is not None:
        dt = dt + dt_bias.float()
    if dt_softplus:
        dt = F.softplus(dt)
    hpg = h // g
    Bf = B.float().repeat_interleave(hpg, dim=2)          # [b, l, h, n]
    Cf = C.float().repeat_interleave(hpg, dim=2)
    state = xf.new_zeros(b, h, p, B.shape[3])
    ys = []
    Af = A.float()
    for t in range(l):
        da = torch.exp(dt[:, t] * Af)                     # [b, h]
        state = (state * da[..., None, None]
                 + (dt[:, t, :, None] * xf[:, t])[..., None]
                 * Bf[:, t, :, None, :])
        ys.append(torch.einsum("bhpn,bhn->bhp", state, Cf[:, t]))
    y = torch.stack(ys, dim=1)                            # [b, l, h, p]
    if D is not None:
        Dv = D.float()
        y = y + xf * (Dv[None, None] if Dv.dim() == 2 else Dv[None, None, :, None])
    if z is not None:
        y = y * F.silu(z.float())
    return y


class _RMSNormGated(tnn.Module):
    def __init__(self, d, eps=1e-5, norm_before_gate=False, group_size=None,
                 **kw):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(d))
        self.eps = eps
        self.norm_before_gate = norm_before_gate
        self.group_size = group_size or d

    def forward(self, x, z=None):
        xf = x.float()
        if z is not None and not self.norm_before_gate:
            xf = xf * F.silu(z.float())
        gs = self.group_size
        shape = xf.shape
        xg = xf.view(*shape[:-1], shape[-1] // gs, gs)
        var = xg.pow(2).mean(-1, keepdim=True)
        y = (xg * torch.rsqrt(var + self.eps)).reshape(shape)
        y = y * self.weight.float()
        if z is not None and self.norm_before_gate:
            y = y * F.silu(z.float())
        return y.to(x.dtype)


class _DropPath(tnn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


def _to_2tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def install_reference_stubs():
    """Install timm/mamba_ssm stand-ins into sys.modules (idempotent)."""
    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.DropPath = _DropPath
        layers.to_2tuple = _to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = timm_models
        timm_models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = layers

    if "mamba_ssm" not in sys.modules:
        root = types.ModuleType("mamba_ssm")
        ops = types.ModuleType("mamba_ssm.ops")
        ssi = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
        ssi.selective_scan_fn = selective_scan_sequential
        ssi.selective_scan_ref = selective_scan_sequential
        triton_pkg = types.ModuleType("mamba_ssm.ops.triton")
        ssu = types.ModuleType("mamba_ssm.ops.triton.selective_state_update")
        ssu.selective_state_update = None
        lng = types.ModuleType("mamba_ssm.ops.triton.layernorm_gated")
        lng.RMSNorm = _RMSNormGated
        ssd_mod = types.ModuleType("mamba_ssm.ops.triton.ssd_combined")
        ssd_mod.mamba_chunk_scan_combined = mamba_chunk_scan_sequential
        ssd_mod.mamba_split_conv1d_scan_combined = None
        dist = types.ModuleType("mamba_ssm.distributed")
        tp = types.ModuleType("mamba_ssm.distributed.tensor_parallel")
        tp.ColumnParallelLinear = tnn.Linear    # only hit when process_group
        tp.RowParallelLinear = tnn.Linear       # is not None (never in tests)
        du = types.ModuleType("mamba_ssm.distributed.distributed_utils")
        du.all_reduce = lambda x, *a, **k: x
        du.reduce_scatter = lambda x, *a, **k: x
        root.Mamba = type("Mamba", (tnn.Module,), {})   # cross.py:9 import
        modules_pkg = types.ModuleType("mamba_ssm.modules")
        msimple = types.ModuleType("mamba_ssm.modules.mamba_simple")
        msimple.Mamba = root.Mamba
        sys.modules["mamba_ssm.modules"] = modules_pkg
        sys.modules["mamba_ssm.modules.mamba_simple"] = msimple
        for name, mod in [
            ("mamba_ssm", root), ("mamba_ssm.ops", ops),
            ("mamba_ssm.ops.selective_scan_interface", ssi),
            ("mamba_ssm.ops.triton", triton_pkg),
            ("mamba_ssm.ops.triton.selective_state_update", ssu),
            ("mamba_ssm.ops.triton.layernorm_gated", lng),
            ("mamba_ssm.ops.triton.ssd_combined", ssd_mod),
            ("mamba_ssm.distributed", dist),
            ("mamba_ssm.distributed.tensor_parallel", tp),
            ("mamba_ssm.distributed.distributed_utils", du),
        ]:
            sys.modules[name] = mod


def load_reference_module(path: str, name: str):
    """Import a reference model file by path (stubs must be installed)."""
    install_reference_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _selective_scan_cuda_fwd(u, delta, A, B, C, D=None, z=None,
                             delta_bias=None, delta_softplus=False, *args):
    """CPU stand-in for the pybind `selective_scan_cuda.fwd`
    (`selective_scan.cpp:495-497` ABI): returns (out, x_checkpoint);
    backward unsupported (parity tests run under no_grad)."""
    out = selective_scan_sequential(u, delta, A, B, C, D=D, z=z,
                                    delta_bias=delta_bias,
                                    delta_softplus=delta_softplus)
    return out, torch.zeros(1)


def install_cross_stubs():
    """Extra stubs for `FusionMamba/models/cross.py` + the vendored
    `vmamba_Fusion_efficross.py` (imports `models.cross`, the CUDA pybind
    module, and builds a .cuda() constant in LDC)."""
    install_reference_stubs()
    if "selective_scan_cuda" not in sys.modules:
        sc = types.ModuleType("selective_scan_cuda")
        sc.fwd = _selective_scan_cuda_fwd
        sc.bwd = None
        sys.modules["selective_scan_cuda"] = sc
    # LDC builds `torch.tensor(...).cuda()` at construction
    # (`cross.py:798-800`) — make .cuda() a no-op on CPU.
    if not getattr(torch.Tensor.cuda, "_cpu_noop", False):
        def _cuda_noop(self, *a, **k):
            return self
        _cuda_noop._cpu_noop = True
        torch.Tensor.cuda = _cuda_noop


def load_fusionmamba_modules():
    """Load cross.py as `models.cross` then the vendored VSSM_Fusion file."""
    install_cross_stubs()
    base = "/root/reference/CrossMamba/FusionMamba/models"
    if "models" not in sys.modules:
        sys.modules["models"] = types.ModuleType("models")
    cross = load_reference_module(f"{base}/cross.py", "models.cross")
    sys.modules["models"].cross = cross
    vm = load_reference_module(f"{base}/vmamba_Fusion_efficross.py",
                               "ref_vmamba_fusion")
    return cross, vm
