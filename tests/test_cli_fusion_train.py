"""Fusion-training CLI smoke: both model paths (`CrossMamba/train.py` VFEFM
and the `train_t.py` vendored VSSM_Fusion) run a step and save a checkpoint."""

import argparse
import os

import numpy as np
import pytest


def _make_pairs(root, n=2, size=32):
    import cv2
    rng = np.random.RandomState(0)
    for d in ("CT", "MRI"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
        for i in range(n):
            cv2.imwrite(os.path.join(root, d, f"{i}.png"),
                        rng.randint(0, 256, (size, size), np.uint8))


def _args(root, save, model, **over):
    base = dict(data_path=root, dir_a="CT", dir_b="MRI", max_pairs=None,
                batch_size=2, image_size=32, epochs=1, lr=2e-4,
                lr_decay=0.75, d_state=4, cat_method="stack", model=model,
                single_decoder=False, depths="1,1", dims="8,16", headdim=4,
                seed=0, log_every=1, save_path=save)
    base.update(over)
    return argparse.Namespace(**base)


@pytest.mark.parametrize("model", ["vfefm", "fusionmamba"])
def test_fusion_train_cli(tmp_path, model):
    from medical_image_classification_tpu.cli.fusion_train import main

    root = str(tmp_path / "ctmri")
    _make_pairs(root)
    save = str(tmp_path / f"{model}.ckpt")
    main(_args(root, save, model))
    assert os.path.isdir(save) or os.path.exists(save)
