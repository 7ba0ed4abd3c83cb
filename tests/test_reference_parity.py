"""Model-level numeric parity against the REAL reference PyTorch models.

The reference's test philosophy is "new implementation vs trusted
implementation with fwd tolerances" (`/root/reference/CrossMamba/FusionMamba/
mamba_ssm/ops/test_selective_scan.py:373-400`).  Here the trusted
implementation is the reference model itself: `/root/reference/MedMamba.py`'s
VSSM (and `/root/reference/SSD/MedSSD.py`'s) run on CPU with stubbed
timm/mamba_ssm (sequential torch scans — see ``reference_stubs.py``), its
``state_dict`` imported via ``utils/torch_import.py``, and the logits
compared element-wise.

Uses 64x64 inputs (L=256 at stage 0) so the sequential torch reference
stays fast; the architecture and weight mapping are identical to 224x224.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.utils.torch_import import (
    import_medmamba_state_dict,
    import_medssd_state_dict,
)

from reference_stubs import load_reference_module

REF = "/root/reference"


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), tree)


@pytest.fixture(scope="module")
def torch_seed():
    torch.manual_seed(0)
    return 0


def _run_parity(ref_model, params, stats, my_model, x_nchw, atol, rtol):
    ref_model.eval()
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(x_nchw)).numpy()

    variables = {"params": _np_tree(params)}
    if stats:
        variables["batch_stats"] = _np_tree(stats)
    x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    logits = np.asarray(my_model.apply(variables, x_nhwc, train=False))

    assert logits.shape == ref_logits.shape
    np.testing.assert_allclose(logits, ref_logits, atol=atol, rtol=rtol)
    assert (logits.argmax(-1) == ref_logits.argmax(-1)).all()


def test_medmamba_logit_parity(torch_seed):
    """Reference MedMamba VSSM (`/root/reference/MedMamba.py:671-767`) vs
    the imported-weights Flax model: max|Δlogit| within fp32 tolerance."""
    mm = load_reference_module(f"{REF}/MedMamba.py", "ref_medmamba")
    depths, dims = (2, 2, 4, 2), (96, 192, 384, 768)
    ref = mm.VSSM(depths=list(depths), dims=list(dims), num_classes=8)
    sd = {k: v.detach().cpu() for k, v in ref.state_dict().items()}

    params, stats = import_medmamba_state_dict(sd, depths=depths, dims=dims)
    model = create_model("medmamba", num_classes=8)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    _run_parity(ref, params, stats, model, x, atol=2e-3, rtol=1e-3)


def test_medssd_logit_parity(torch_seed):
    """Reference MedSSD (`/root/reference/SSD/MedSSD.py`) vs the
    imported-weights Flax model — exercises the SSD multi-head path
    including the reference's B/C direction-flattening layout."""
    ms = load_reference_module(f"{REF}/SSD/MedSSD.py", "ref_medssd")
    depths, dims = (2, 2, 4, 2), (128, 256, 512, 1024)
    ref = ms.VSSM(depths=list(depths), dims=list(dims), num_classes=8)
    sd = {k: v.detach().cpu() for k, v in ref.state_dict().items()}

    params, stats = import_medssd_state_dict(sd, depths=depths, dims=dims)
    model = create_model("medssd", num_classes=8)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    _run_parity(ref, params, stats, model, x, atol=3e-3, rtol=1e-3)
