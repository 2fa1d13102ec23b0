#!/usr/bin/env python
"""GAPartNet-TPU training CLI.

Mirrors the reference entry point (gapartnet/train.py:62-69):

    python train.py fit  -c gapartnet.yaml [--model.init_args.X val ...]
    python train.py test -c gapartnet.yaml --model.init_args.ckpt <ckpt> \
        --model.init_args.training_schedule "[0,0]"

Accepts the reference gapartnet.yaml schema directly (see
gapartnet_tpu/train/config.py).
"""

import sys

from gapartnet_tpu.train.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
