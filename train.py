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


def main(argv):
    from gapartnet_tpu.train.config import load_config, parse_cli
    from gapartnet_tpu.train import trainer

    sub, cfg_path, overrides = parse_cli(argv)
    cfg = load_config(cfg_path, overrides)
    print(f"[gapartnet_tpu] {sub} with model={cfg.model}")
    if sub == "fit":
        trainer.fit(cfg)
    else:
        trainer.test(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
