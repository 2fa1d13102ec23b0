"""Console entry point (`gapartnet-train fit|test -c config.yaml ...`).

Same CLI surface as the repo-root `train.py` (which mirrors the reference
gapartnet/train.py:62-69 LightningCLI invocation).
"""

import sys


def main(argv=None):
    from gapartnet_tpu.train import trainer
    from gapartnet_tpu.train.config import load_config, parse_cli

    if argv is None:
        argv = sys.argv[1:]
    sub, cfg_path, overrides = parse_cli(argv)
    cfg = load_config(cfg_path, overrides)
    print(f"[gapartnet_tpu] {sub} with model={cfg.model}")
    if sub == "fit":
        trainer.fit(cfg)
    else:
        trainer.test(cfg)


if __name__ == "__main__":
    main()
