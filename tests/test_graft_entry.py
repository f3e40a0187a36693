"""Driver entry-point contract tests.

The driver invokes ``__graft_entry__.dryrun_multichip(8)`` in a FRESH process on
a host with one real chip (MULTICHIP_r01.json failure mode).  These tests pin
both halves of the contract:

- in-process: with the conftest's 8-device CPU mesh the body runs directly;
- subprocess: with a clean 1-visible-device env the function must self-provision
  a virtual mesh and still succeed.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_process():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # conftest forced 8 CPU devices -> direct body
    finally:
        sys.path.remove(REPO)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_from_one_device():
    """Reproduce the driver environment: 1 visible device, fresh process."""
    env = dict(os.environ)
    # Simulate the driver host: one CPU device visible, no forced count.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env.pop("_TAN_DRYRUN_INNER", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import __graft_entry__ as g\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_multiprocess_self_check():
    """The pod-shaped 2-process self-check (TAN_DRYRUN_MULTIPROCESS mode):
    workers launch under jax.distributed, each feeds its own batch rows, and
    the shared-mesh co-train step runs.  Exercised directly so a break here
    doesn't wait for a driver run with the env flag set."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g

        g.dryrun_multiprocess(num_processes=2, devices_per_process=2)
    finally:
        sys.path.remove(REPO)
