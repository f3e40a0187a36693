"""Subprocess entry point for the multi-process eval-CLI test.

Forces the CPU platform via jax.config (the env var alone is overridden by
this image's sitecustomize) and hands argv to the eval CLI — which carries
--multihost/--coordinator/--num_processes/--process_id like the trainer.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from temporalalignnet_tpu.eval.cli import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
