"""Multi-host initialization and host-gated side effects.

Replaces the reference's SLURM/NCCL plumbing (end2end/main_nce.py:140-158,
end2end/config.py:40-50): one call wires every host into the same JAX runtime;
the global Mesh from parallel.mesh then spans all chips, with GSPMD collectives
riding ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize from args or SLURM/cloud-TPU env; returns
    True if a multi-process runtime was set up.

    Mirrors the reference's env-driven rank discovery (SLURM_PROCID /
    launcher env, main_nce.py:143-151) without the torch.distributed layer —
    on Cloud TPU pods jax.distributed.initialize() autodetects everything.
    """
    import jax

    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ.get("SLURM_PROCID", 0))
    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    try:  # TPU pod autodetection; harmless no-op failure elsewhere
        jax.distributed.initialize()
        return jax.process_count() > 1
    except Exception:
        return False


def is_master() -> bool:
    """Master-only side-effect gate (reference gates on SLURM_PROCID,
    main_nce.py:406-407)."""
    import jax

    return jax.process_index() == 0


def master_print(*args, **kwargs) -> None:
    """Print suppressed off-master (main_nce.py:154-158)."""
    if is_master():
        print(*args, **kwargs)
