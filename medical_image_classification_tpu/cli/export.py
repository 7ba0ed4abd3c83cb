"""AOT model export for serving.

Serializes a jitted inference function (preprocessing + forward -> logits)
to the portable StableHLO-based `jax.export` format, weights baked in as
constants.  The artifact reloads with `jax.export.deserialize` and runs
under `jax.jit` on any backend that supports the lowered platform — no
model code, registry, or checkpoint plumbing needed at serving time.

The reference has no serving story beyond `torch.load` of a `.pth`
(`/root/reference/test.py:40`); this is the TPU-native production path.

  python -m medical_image_classification_tpu.cli.export \
      --model medmamba --weights runs/model.ckpt.best \
      --batch-size 8 --out runs/medmamba.jaxexport [--platform tpu]

  # smoke-check a saved artifact (random input, prints logits shape):
  python -m medical_image_classification_tpu.cli.export \
      --load runs/medmamba.jaxexport
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from medical_image_classification_tpu.data.image_folder import normalize_batch


def build_serve_fn(model_name: str, num_classes: int, weights: str | None,
                   batch_size: int, image_size: int, dtype):
    """Returns (fn, example_args): uint8 NHWC images -> logits."""
    from medical_image_classification_tpu.models import create_model
    from medical_image_classification_tpu.train.checkpoint import (
        load_params_only)

    model = create_model(model_name, num_classes=num_classes, dtype=dtype)
    imgs = jnp.zeros((batch_size, image_size, image_size, 3), jnp.uint8)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), imgs)
    if weights:
        params = load_params_only(weights, variables["params"])
        variables = {**variables, "params": params}

    def serve(images_u8):
        x = normalize_batch(images_u8)
        return model.apply(variables, x, train=False)

    return serve, (imgs,)


def export_model(args) -> bytes:
    dtype = {"bf16": jnp.bfloat16, "fp32": None}[args.dtype]
    serve, ex_args = build_serve_fn(args.model, args.num_classes,
                                    args.weights, args.batch_size,
                                    args.image_size, dtype)
    platforms = [args.platform] if args.platform else None
    exported = jax_export.export(jax.jit(serve), platforms=platforms)(*ex_args)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.model} -> {args.out} "
          f"({len(blob)} bytes, platforms={exported.platforms}, "
          f"in={exported.in_avals}, out={exported.out_avals})")
    return blob


def load_and_check(path: str):
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    aval = exported.in_avals[0]
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, aval.shape, dtype=np.uint8))
    out = jax.jit(exported.call)(x)
    print(f"loaded {path}: {aval.shape} {aval.dtype} -> "
          f"{out.shape} {out.dtype}; logits[0,:4]={np.asarray(out)[0, :4]}")
    return out


def main(args):
    if args.load:
        load_and_check(args.load)
    else:
        export_model(args)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="medmamba")
    p.add_argument("--num-classes", type=int, default=8)
    p.add_argument("--weights", default=None,
                   help="params-only checkpoint (cli.train --save-path)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--platform", default=None,
                   help="lowering platform (tpu/cpu); default = current")
    p.add_argument("--out", default="runs/model.jaxexport")
    p.add_argument("--load", default=None,
                   help="smoke-check a saved artifact instead of exporting")
    main(p.parse_args())
