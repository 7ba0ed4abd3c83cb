"""Grad-CAM and data-pipeline tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.evaluate.gradcam import (
    grad_cam, overlay_heatmap,
)

SMALL = dict(depths=(1, 1), dims=(16, 32), drop_path_rate=0.0, ssd_headdim=8,
             d_state=4)


def test_gradcam_shapes_and_range():
    model = create_model("medmamba", num_classes=4, **SMALL)
    imgs = np.random.RandomState(0).randint(0, 256, (2, 32, 32, 3),
                                            dtype=np.uint8)
    vars_ = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 32, 32, 3)), train=False)
    vars_ = {k: v for k, v in vars_.items() if k != "perturbations"}
    cams = grad_cam(model, vars_, imgs)
    assert cams.shape == (2, 32, 32)
    assert cams.min() >= 0.0 and cams.max() <= 1.0 + 1e-6
    assert cams.std() > 0, "CAM is constant — gradients not flowing"
    over = overlay_heatmap(imgs[0], cams[0])
    assert over.shape == (32, 32, 3) and over.dtype == np.uint8


def _make_image_folder(root, classes=("amd", "dme"), n=3, size=40):
    import cv2
    rng = np.random.RandomState(0)
    for c in classes:
        d = os.path.join(root, c)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            img = rng.randint(0, 256, (size, size, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(d, f"{i}.png"), img)


def test_image_folder_scan_and_loader(tmp_path):
    from medical_image_classification_tpu.data.image_folder import (
        scan_image_folder, dump_class_indices, load_eval_image,
        load_train_image)
    from medical_image_classification_tpu.data.loader import BatchLoader

    root = str(tmp_path / "data")
    _make_image_folder(root)
    ds = scan_image_folder(root)
    assert ds.classes == ["amd", "dme"]
    assert len(ds) == 6
    mapping = dump_class_indices(ds, str(tmp_path / "class_indices.json"))
    assert mapping["0"] == "amd"

    img = load_eval_image(ds.samples[0][0], 32)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    img = load_train_image(ds.samples[0][0], 32, np.random.default_rng(0))
    assert img.shape == (32, 32, 3)

    loader = BatchLoader(ds, batch_size=4, image_size=32, train=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch() == 1
    imgs, labels = batches[0]
    assert imgs.shape == (4, 32, 32, 3) and labels.shape == (4,)

    # determinism: same epoch -> same batch; different epoch -> different order
    imgs2, labels2 = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(imgs, imgs2)


def test_loader_sharding(tmp_path):
    from medical_image_classification_tpu.data.image_folder import scan_image_folder
    from medical_image_classification_tpu.data.loader import BatchLoader
    root = str(tmp_path / "data")
    _make_image_folder(root, n=8)
    ds = scan_image_folder(root)
    l0 = BatchLoader(ds, 4, 32, train=False, shard_index=0, shard_count=2)
    l1 = BatchLoader(ds, 4, 32, train=False, shard_index=1, shard_count=2)
    i0 = l0._epoch_indices(0)
    i1 = l1._epoch_indices(0)
    assert len(i0) == len(i1) == 8
    assert set(i0).isdisjoint(set(i1)) or len(set(i0) | set(i1)) == 16


def test_synthetic_loader():
    from medical_image_classification_tpu.data.loader import SyntheticLoader
    l = SyntheticLoader(4, 32, 5, steps=3)
    batches = list(l.epoch(0))
    assert len(batches) == 3
    assert batches[0][0].shape == (4, 32, 32, 3)


def test_native_decoder_matches_cv2(tmp_path):
    """Native C++ decode+resize vs OpenCV on synthetic PNGs/JPEGs."""
    from medical_image_classification_tpu.data import native_loader
    if not native_loader.native_available():
        pytest.skip("no native toolchain")
    import cv2
    rng = np.random.RandomState(0)
    paths = []
    for i, ext in enumerate([".png", ".jpg", ".png"]):
        img = rng.randint(0, 256, (50 + i * 7, 40, 3), dtype=np.uint8)
        p = str(tmp_path / f"x{i}{ext}")
        cv2.imwrite(p, img)
        paths.append(p)
    out = native_loader.decode_batch(paths, 32, train=False, seed=0)
    assert out.shape == (3, 32, 32, 3) and out.dtype == np.uint8
    # compare against cv2 INTER_LINEAR resize of the same decode
    for i, p in enumerate(paths):
        ref = cv2.imread(p, cv2.IMREAD_COLOR)[:, :, ::-1]
        ref = cv2.resize(ref, (32, 32), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert np.mean(diff) < 3.0, f"mean abs diff {np.mean(diff)}"


def test_native_decoder_scaled_jpeg_path(tmp_path):
    """Large smooth JPEG: the decoder's IDCT-scaled + region-cropped fast
    path engages (496x512 -> 4/8 scale for a 224 target) and must stay
    geometrically exact vs a full-resolution reference resample."""
    from medical_image_classification_tpu.data import native_loader
    if not native_loader.native_available():
        pytest.skip("no native toolchain")
    import cv2
    yy, xx = np.mgrid[0:496, 0:512].astype(np.float32)
    img = np.clip(120 + 60 * np.sin(yy / 37.0) + 40 * np.cos(xx / 53.0)
                  + 80 * np.exp(-((yy - 130) ** 2 + (xx - 310) ** 2)
                                / (2 * 40.0 ** 2)), 0, 255).astype(np.uint8)
    img = np.stack([img] * 3, -1)
    p = str(tmp_path / "big.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    out = native_loader.decode_batch([p], 224, train=False, seed=0)[0]
    ref = cv2.resize(cv2.imread(p)[:, :, ::-1], (224, 224),
                     interpolation=cv2.INTER_AREA)
    diff = np.abs(out.astype(int) - ref.astype(int))
    # smooth content: every downsampling filter agrees closely; a region
    # offset bug would show up as a large max diff at the blob edge
    assert diff.mean() < 1.0 and diff.max() <= 20, (diff.mean(), diff.max())
    # train mode on the scaled path stays deterministic per seed
    a = native_loader.decode_batch([p, p], 224, train=True, seed=3)
    b = native_loader.decode_batch([p, p], 224, train=True, seed=3)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a[0], a[1])


def test_native_decoder_train_mode(tmp_path):
    from medical_image_classification_tpu.data import native_loader
    if not native_loader.native_available():
        pytest.skip("no native toolchain")
    import cv2
    img = np.random.RandomState(1).randint(0, 256, (64, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    cv2.imwrite(p, img)
    a = native_loader.decode_batch([p, p], 32, train=True, seed=7)
    b = native_loader.decode_batch([p, p], 32, train=True, seed=7)
    np.testing.assert_array_equal(a, b)          # deterministic per seed
    c = native_loader.decode_batch([p, p], 32, train=True, seed=8)
    assert not np.array_equal(a, c)              # seed changes the crop
    # the two identical paths in one batch get different crops
    assert not np.array_equal(a[0], a[1])
