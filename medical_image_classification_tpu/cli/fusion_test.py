"""Fusion inference CLI (`/root/reference/CrossMamba/FusionMamba/test.py:53-103`):
folder-pair loop, 256² grayscale, clamp + min-max, save PNG, wall-clock print.

  python -m medical_image_classification_tpu.cli.fusion_test \
      --data-path /data/CT_MRI --weights runs/fusion.ckpt --out-dir fused/
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.data.fusion_dataset import (
    load_fusion_image, scan_fusion_pairs)
from medical_image_classification_tpu.models.crossmamba import FusionVFEFM
from medical_image_classification_tpu.train.checkpoint import load_params_only
from medical_image_classification_tpu.utils.logging_utils import get_logger


def main(args):
    import cv2
    log = get_logger()
    pairs = scan_fusion_pairs(args.data_path, args.dir_a, args.dir_b)
    model = FusionVFEFM(single_decoder=args.single_decoder,
                        d_state=args.d_state, cat_method=args.cat_method)
    x0 = jnp.zeros((1, args.image_size, args.image_size, 3))
    import functools
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, x0, x0)
    params = variables["params"]
    if args.weights:
        params = load_params_only(args.weights, params)
    bstats = variables.get("batch_stats", {})

    @jax.jit
    def infer(xa, xb):
        out = model.apply({"params": params, "batch_stats": bstats},
                          xa, xb, train=False)
        return jnp.clip(out, 0.0, 1.0)

    os.makedirs(args.out_dir, exist_ok=True)
    t0 = time.time()
    for pa, pb in zip(pairs.a_paths, pairs.b_paths):
        xa = load_fusion_image(pa, args.image_size, 3)[None]
        xb = load_fusion_image(pb, args.image_size, 3)[None]
        fused = np.asarray(infer(jnp.asarray(xa), jnp.asarray(xb)))[0, ..., 0]
        mn, mx = fused.min(), fused.max()
        fused = (fused - mn) / max(mx - mn, 1e-8)
        name = os.path.splitext(os.path.basename(pa))[0] + "_fused.png"
        cv2.imwrite(os.path.join(args.out_dir, name),
                    (fused * 255).astype(np.uint8))
    log.info("fused %d pairs in %.2fs", len(pairs), time.time() - t0)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--dir-a", default="CT")
    p.add_argument("--dir-b", default="MRI")
    p.add_argument("--weights", default=None)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--d-state", type=int, default=128)
    p.add_argument("--cat-method", default="stack")
    p.add_argument("--single-decoder", action="store_true")
    p.add_argument("--out-dir", default="fused")
    main(p.parse_args())
