"""Subprocess entry for the SIGKILL-during-async-save robustness test.

Runs the training CLI with ``save_runtime`` instrumented: right BEFORE the
orbax save of the step given by $TAN_KILL_AT_STEP starts, it writes
$TAN_KILL_MARKER, then proceeds into the (async) save and parks afterwards so
the parent's SIGKILL always lands while the process still owns an in-flight
or just-committed write — never after a clean exit.  The parent varies the
kill delay to land before, during, or after the background commit; all
outcomes must resume cleanly (tests/test_resume.py).
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

from temporalalignnet_tpu.checkpoint import orbax_io  # noqa: E402

_MARKER = os.environ["TAN_KILL_MARKER"]
_KILL_AT = int(os.environ["TAN_KILL_AT_STEP"])
_real_save = orbax_io.Checkpointer.save_runtime


def _marked_save(self, state, step):
    if step == _KILL_AT:
        with open(_MARKER, "w") as f:
            f.write(str(step))
    _real_save(self, state, step)
    if step == _KILL_AT:
        # park: keep the process (and orbax's background write thread) alive
        # until the parent's SIGKILL arrives — the test must never see this
        # save complete through a clean exit
        time.sleep(300)


orbax_io.Checkpointer.save_runtime = _marked_save

from temporalalignnet_tpu.train.cli import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
