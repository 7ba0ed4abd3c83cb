"""Full-metric-suite alias (`/root/reference/test_all_index.py` parity):
equivalent to `cli.test --all-index`.

  python -m medical_image_classification_tpu.cli.test_all_index \
      --data-path /data/oct/test --model medmamba --weights W --csv-out m.csv
"""

import argparse

from medical_image_classification_tpu.cli.test import main

if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--model", default="medmamba")
    p.add_argument("--num-classes", type=int, default=8)
    p.add_argument("--weights", default=None)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--csv-out", default="metrics.csv")
    args = p.parse_args()
    args.all_index = True
    main(args)
