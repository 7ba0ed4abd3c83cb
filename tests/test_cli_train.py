"""End-to-end train-CLI test on a synthetic ImageFolder: train, checkpoint,
resume (the ddp_train.py resume contract, `ddp_train.py:142-150`)."""

import os

import numpy as np
import pytest


def _make_dataset(root, n=6, size=32):
    import cv2
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for cls in ("a", "b"):
            d = os.path.join(root, split, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                cv2.imwrite(os.path.join(d, f"{i}.png"),
                            rng.randint(0, 256, (size, size, 3), np.uint8))


def test_train_cli_and_resume(tmp_path, monkeypatch):
    from medical_image_classification_tpu.cli.train import main
    from medical_image_classification_tpu.utils.config import TrainConfig
    import medical_image_classification_tpu.models.registry as registry

    root = str(tmp_path / "data")
    _make_dataset(root)
    monkeypatch.chdir(tmp_path)   # class_indices.json lands here

    # shrink the model zoo entry for the test
    orig = registry._REGISTRY["medmamba"]

    def tiny(num_classes, **kw):
        kw.update(depths=(1, 1), dims=(16, 32), d_state=4, drop_path_rate=0.0)
        return orig(num_classes, **kw)

    monkeypatch.setitem(registry._REGISTRY, "medmamba", tiny)

    save = str(tmp_path / "runs" / "m.ckpt")
    cfg = TrainConfig(data_path=os.path.join(root, "train"),
                      val_path=os.path.join(root, "val"),
                      model="medmamba", num_classes=2, epochs=1,
                      batch_size=4, image_size=32, lr=1e-3,
                      save_path=save, log_every=0, num_workers=2)
    main(cfg)
    assert os.path.isdir(save)                      # composite checkpoint
    assert os.path.isdir(save + ".best")            # best params
    assert os.path.exists(str(tmp_path / "class_indices.json"))

    # resume for one more epoch
    cfg2 = TrainConfig(**{**cfg.__dict__, "epochs": 2, "resume": save})
    main(cfg2)
