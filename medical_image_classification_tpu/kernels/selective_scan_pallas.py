"""Pallas TPU selective-scan kernel (Mamba-1 hot path).

Replaces the reference CUDA blocked scan
(`/root/reference/CrossMamba/FusionMamba/selective_scan/selective_scan_fwd_kernel.cuh`).

Design (TPU-shaped, not a CUDA translation):
  * grid over the batch(*direction) axis; each program owns one sequence.
  * the [N, D] state lives in VMEM scratch (D on the lane dimension).
  * time is processed in chunks; within a chunk an associative doubling scan
    runs on [T, N*D]-shaped VMEM arrays so the VPU sees full 8x128 tiles.
  * fp32 state and accumulation throughout (parity with the reference's
    fp32 cast, MedMamba.py:404-409).
  * backward = a second scan (custom_vjp), no atomics: per-chunk partial
    weight grads are accumulated in VMEM and reduced at the end.

NOTE: the first milestone ships the chunked-XLA path; this module currently
gates itself off via ``pallas_supported`` returning False until the kernel
lands (tracked in bench notes).  The dispatcher in ``selective_scan.py``
falls back transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pallas_supported(u, A, B) -> bool:
    return False


def selective_scan_pallas(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                          delta_softplus=False, return_last_state=False):
    raise NotImplementedError("Pallas selective scan lands after the e2e slice")
