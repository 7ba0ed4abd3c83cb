"""Grad-CAM CLI (`/root/reference/cam.py:239-302` equivalent).

  python -m medical_image_classification_tpu.cli.cam \
      --image img.png --model medmamba --weights runs/model.ckpt.best \
      --out cam.png [--stages layers_2,layers_3]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.data.image_folder import load_eval_image
from medical_image_classification_tpu.evaluate.gradcam import (
    grad_cam, overlay_heatmap)
from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.train.checkpoint import load_params_only
from medical_image_classification_tpu.train.optim import make_optimizer
from medical_image_classification_tpu.train.train_state import init_train_state
from medical_image_classification_tpu.utils.logging_utils import get_logger


def main(args):
    import cv2
    log = get_logger()
    model = create_model(args.model, num_classes=args.num_classes)
    img = load_eval_image(args.image, args.image_size)[None]
    state = init_train_state(model, jax.random.PRNGKey(0),
                             jnp.asarray(img), make_optimizer("adam", 1e-4))
    params = state.params
    if args.weights:
        params = load_params_only(args.weights, params)
    variables = {"params": params, **state.model_state}
    stages = args.stages.split(",") if args.stages else None
    target = None if args.target is None else jnp.asarray([args.target])
    cams = grad_cam(model, variables, img, targets=target, stages=stages)
    out = overlay_heatmap(img[0], cams[0], alpha=args.alpha)
    cv2.imwrite(args.out, out[:, :, ::-1])
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--model", default="medmamba")
    p.add_argument("--num-classes", type=int, default=8)
    p.add_argument("--weights", default=None)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--stages", default=None,
                   help="comma-separated stage names (default: all)")
    p.add_argument("--target", type=int, default=None)
    p.add_argument("--alpha", type=float, default=0.4)
    p.add_argument("--out", default="cam.png")
    main(p.parse_args())
