"""GPU-stack-style launcher: `python -m deep_neuroevolution_tpu.train cfg.json`
(gpu_implementation/es.py:290-293 / ga.py:275-277 invocation shape).
Delegates to main.py's `train` subcommand with schema auto-detection."""

import sys

from .main import main

if __name__ == "__main__":
    cfg = sys.argv[-1]
    sys.exit(main(["train", "--exp_file", cfg, "--log_dir", "logs", "--iterations", "0"]))
