"""Subprocess entry point for the multi-process end2end fine-tune CPU tests.

Forces the CPU platform via jax.config (the env var alone is overridden by
this image's sitecustomize) and hands argv to the end2end CLI — which carries
--multihost/--coordinator/--num_processes/--process_id like the main trainer.
The parent test (test_multiprocess.py) launches N of these against one
coordinator and compares the exported params to a single-process run of the
same global configuration (the reference's DDP path, end2end/main_nce.py).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from temporalalignnet_tpu.train.end2end_cli import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
