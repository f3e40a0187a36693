"""Subprocess entry point for the multi-process jax.distributed CPU tests.

Forces the CPU platform via jax.config (the env var alone is overridden by
this image's sitecustomize) and hands argv straight to the training CLI —
which already carries --multihost/--coordinator/--num_processes/--process_id.
The parent test (test_multiprocess.py) launches N of these against one
coordinator and compares the result to a single-process run of the same
global configuration.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from temporalalignnet_tpu.train.cli import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
