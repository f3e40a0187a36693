"""Device mesh and sharding rules.

The reference's only real distribution is NCCL DDP on the end2end path
(end2end/main_nce.py:283-285); TAN training itself is single-GPU
(train/main.py:256-257, model never wrapped).  The TPU-native design replaces all of
that with a single ``jax.sharding.Mesh`` and GSPMD:

- ``data`` axis: batch sharded.  The MIL-NCE loss couples every video token with
  every sentence in the global batch (train/loss.py:84-85); under pjit, annotating the
  batch with PartitionSpec('data') makes XLA insert the all-gather of the (cheap,
  512-d) normalized features over ICI automatically — no hand-written collectives.
- ``model`` axis: tensor-parallel sharding of attention heads and MLP hidden dim.
  The reference model is only 512-wide so TP is optional (SURVEY §2.8), but the rules
  are wired so larger variants scale.
"""

from __future__ import annotations

import functools
import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp_size: int = -1, tp_size: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    dp_size == -1 means "all devices / tp_size".  When no explicit device list
    is given, jax's mesh_utils picks a physical-topology-aware ordering so the
    inner (model/TP) axis — which carries per-layer activation collectives —
    rides contiguous ICI links, and DP gradient all-reduces use the remaining
    torus dimensions (the scaling-book layout recipe).
    """
    explicit = devices is not None
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp_size == -1:
        assert n % tp_size == 0, f"{n} devices not divisible by tp={tp_size}"
        dp_size = n // tp_size
    want = dp_size * tp_size
    assert want <= n, f"dp {dp_size} x tp {tp_size} > {n} devices"
    if want < n:  # explicit smaller mesh: use a device-prefix
        devices = devices[:want]
        explicit = True
    if not explicit:
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh((dp_size, tp_size))
            return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
        except Exception:
            pass  # e.g. CPU platform without topology info
    dev_array = np.asarray(devices).reshape(dp_size, tp_size)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def local_batch_rows(mesh: Mesh, global_batch: int) -> tuple:
    """[lo, hi) rows of a batch-sharded global array owned by THIS process.

    The multi-process DistributedSampler parity (reference
    end2end/main_nce.py:229-231): every host derives the same global epoch
    order, then builds only the rows its own devices hold under
    P('data'), so jax.make_array_from_process_local_data can assemble the
    global batch without cross-host copies.  Asserts contiguity — the
    meshes built here keep each process's devices adjacent on the data
    axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    slices = sh.addressable_devices_indices_map((global_batch,)).values()
    starts = [s[0].start or 0 for s in slices]
    stops = [global_batch if s[0].stop is None else s[0].stop for s in slices]
    lo, hi = min(starts), max(stops)
    owned = {(a, b) for a, b in zip(starts, stops)}  # dedup tp replicas
    assert sum(b - a for a, b in owned) == hi - lo, (
        "process's batch rows are not contiguous under this mesh; "
        "reorder devices so each process owns one slab of the data axis"
    )
    return int(lo), int(hi)


def put_global(value, sharding: NamedSharding):
    """device_put that works in single- AND multi-process runtimes.

    Single-process: plain device_put of the full array.  Multi-process: the
    caller passes this process's LOCAL shard (the rows local_batch_rows says
    it owns) and the global jax.Array is assembled from per-process pieces —
    the jax.make_array_from_process_local_data shape of the reference's
    DistributedSampler + DDP feed (end2end/main_nce.py:229-231,283-285),
    where data never crosses hosts."""
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(value))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_from_host(value, sharding: NamedSharding):
    """Full host copy (identical on every process) -> global jax.Array.

    Unlike put_global (which takes each process's LOCAL rows), the caller
    here holds the ENTIRE array on every process — the eval-corpus shape,
    where every host loads the same annotation files.  Single-process this
    is a plain device_put; multi-process, device_put cannot address other
    hosts' devices, so each process donates the slices its own devices own
    (replicated specs hand every device the full array)."""
    value = np.asarray(value)
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def replicate_eval_params(params: Any, mesh: Mesh) -> Any:
    """Replicate single-device param leaves onto ``mesh`` for sharded eval.

    Params committed to one device (converter output through load_params, or
    a plain device array) conflict with mesh-sharded batches inside jit;
    those leaves replicate onto the mesh (multi-process-safe via
    put_from_host).  Already mesh-placed (multi-device) leaves — e.g.
    TP-sharded — are kept as-is."""
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: x
        if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1
        else put_from_host(x, rep),
        params,
    )


def fetch_global(x) -> np.ndarray:
    """Device -> full host value on EVERY process.

    np.asarray works on fully-addressable or fully-replicated jax.Arrays
    only; a batch-sharded output of a multi-process jit is neither.  Rather
    than special-case callers, reshard to replicated (an all-gather over
    ICI/DCN, inserted by XLA) and read the local copy."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable or (
        getattr(x.sharding, "is_fully_replicated", False)
    ):
        return np.asarray(x)
    return np.asarray(_replicate_fn(replicated_sharding(x.sharding.mesh))(x))


@functools.lru_cache(maxsize=None)
def _replicate_fn(rep: NamedSharding):
    # One jitted identity per target sharding: a fresh lambda per fetch_global
    # call would defeat jit's trace cache and recompile the all-gather every
    # fetch (a compile round-trip per evaluator output on real pods).
    return jax.jit(lambda a: a, out_shardings=rep)


# Tensor-parallel rules, matched against '/'-joined flax param paths.
# Head-sharded projections: q/k/v kernels [D, D] shard output dim; out kernel [D, D]
# shards input dim (row-parallel => psum on output, inserted by GSPMD).
# MLP: c_fc kernel [D, 4D] shards hidden out-dim, c_proj [4D, D] shards in-dim.
_TP_RULES = (
    (re.compile(r".*attn/(q_proj|k_proj|v_proj)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*attn/(q_proj|k_proj|v_proj)/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*attn/out_proj/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r".*mlp/c_fc/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*mlp/c_fc/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*mlp/c_proj/kernel$"), P(MODEL_AXIS, None)),
)


def param_sharding_rules(path: str) -> P:
    """PartitionSpec for one parameter, given its '/'-joined path."""
    for pattern, spec in _TP_RULES:
        if pattern.match(path):
            return spec
    return P()  # replicated


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Return a pytree of NamedShardings mirroring ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, param_sharding_rules(_path_str(path))),
        params,
    )


def place_params(params: Any, mesh: Mesh) -> Any:
    """Device_put params according to the TP rules."""
    shardings = shard_params(params, mesh)
    return jax.device_put(params, shardings)


def place_opt_state(opt_state: Any, mesh: Mesh) -> Any:
    """Device_put an optax state onto the mesh.

    Param-shaped moments live under paths that END with the param path
    (e.g. ``.../mu/aligner/.../attn/q_proj/kernel``), so the same TP rules
    match; scalar counters and anything unmatched replicate.  Needed because
    leaves created by ``tx.init`` outside an explicit placement end up
    committed to device 0, which later conflicts with mesh-placed params
    inside jit (and checkpoint restore faithfully reproduces the skew).
    """

    def sharding(path, leaf):
        if getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_sharding_rules(_path_str(path)))

    return jax.device_put(
        opt_state, jax.tree_util.tree_map_with_path(sharding, opt_state)
    )
