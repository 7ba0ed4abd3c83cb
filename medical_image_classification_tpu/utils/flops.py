"""Analytic FLOP models + profiling helpers.

Rebuild of the reference's einsum-path scan FLOP counter
(`/root/reference/MedMamba.py:28-143`, duplicated per model file) and the
thop-based `cal_params_flops` (`FusionMamba/utils.py:450-462`).  On TPU we
also expose XLA's own cost analysis, which is exact for the compiled program.
"""

from __future__ import annotations

from typing import Optional


def selective_scan_flops(B: int, L: int, D: int, N: int, with_D: bool = True,
                         with_z: bool = False, with_group: bool = True) -> int:
    """MAC count of one selective-scan call (matches the reference's
    einsum-path accounting: 9·B·L·D·N core + tails)."""
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    if with_z:
        flops += B * D * L
    return flops


def ssd_flops(B: int, L: int, H: int, P: int, N: int, chunk: int) -> int:
    """Matmul MACs of the chunked SSD scan."""
    nc = -(-L // chunk)
    intra = B * nc * H * chunk * chunk * (N + P)      # scores + Y_diag
    states = B * nc * H * chunk * N * P               # state build
    off = B * nc * H * chunk * N * P                  # state consume
    return intra + states + off


def xla_cost_analysis(fn, *args) -> dict:
    """Exact FLOPs/bytes of the lowered XLA program for fn(*args)."""
    import jax
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return dict(ca) if ca else {}


def model_flops(model, variables, sample_input) -> Optional[float]:
    """FLOPs of one forward pass via XLA cost analysis."""
    import jax

    def fwd(v, x):
        return model.apply(v, x, train=False)

    try:
        return float(xla_cost_analysis(fwd, variables, sample_input)
                     .get("flops", -1.0))
    except Exception:
        return None
