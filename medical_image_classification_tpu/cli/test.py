"""Evaluation CLI: top-1 (`/root/reference/test.py`) and the full metric
suite + CSV (`/root/reference/test_all_index.py`) in one script.

  python -m medical_image_classification_tpu.cli.test \
      --data-path /data/oct/test --model medmamba --weights runs/model.ckpt.best \
      [--all-index --csv-out metrics.csv]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.data.image_folder import scan_image_folder
from medical_image_classification_tpu.data.loader import BatchLoader
from medical_image_classification_tpu.evaluate.metrics import (
    classification_metrics, count_parameters, metrics_to_csv)
from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.train.checkpoint import load_params_only
from medical_image_classification_tpu.train.optim import make_optimizer
from medical_image_classification_tpu.train.train_state import (
    init_train_state, make_eval_step)
from medical_image_classification_tpu.utils.logging_utils import get_logger


def main(args):
    log = get_logger()
    ds = scan_image_folder(args.data_path)
    model = create_model(args.model, num_classes=args.num_classes)
    sample = jnp.zeros((args.batch_size, args.image_size, args.image_size, 3),
                       jnp.uint8)
    state = init_train_state(model, jax.random.PRNGKey(0), sample,
                             make_optimizer("adam", 1e-4))
    if args.weights:
        params = load_params_only(args.weights, state.params)
        state = state.replace(params=params)
    eval_step = make_eval_step(model)

    loader = BatchLoader(ds, args.batch_size, args.image_size, train=False)
    ys, preds, scores = [], [], []
    for imgs, labels in loader.epoch(0):
        pad = args.batch_size - imgs.shape[0]
        if pad:
            imgs = np.pad(imgs, ((0, pad), (0, 0), (0, 0), (0, 0)))
        _, logits = eval_step(state, jnp.asarray(imgs),
                              jnp.zeros((args.batch_size,), jnp.int32))
        logits = np.asarray(logits)[:imgs.shape[0] - pad if pad else None]
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        ys.append(labels)
        preds.append(logits.argmax(-1))
        scores.append(probs)
    y = np.concatenate(ys)
    pred = np.concatenate(preds)
    sc = np.concatenate(scores)

    if args.all_index:
        m = classification_metrics(y, pred, sc, num_classes=args.num_classes)
        m["param_count"] = count_parameters(state.params)
        for k, v in m.items():
            log.info("%s: %s", k, v)
        if args.csv_out:
            metrics_to_csv(args.csv_out, m, extra={"model": args.model})
            log.info("wrote %s", args.csv_out)
    else:
        acc = float((y == pred).mean())
        log.info("test top-1 accuracy: %.4f (%d images)", acc, len(y))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--model", default="medmamba")
    p.add_argument("--num-classes", type=int, default=8)
    p.add_argument("--weights", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--all-index", action="store_true")
    p.add_argument("--csv-out", default=None)
    main(p.parse_args())
