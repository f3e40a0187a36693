"""Fused sim-matrix + masked-logsumexp MIL-NCE Pallas TPU kernel.

The training loss (losses/tan_loss.py, reference train/loss.py:240-275) builds a
per-layer cross-batch similarity tensor [B, S, T, B, N] (~60 MB fp32 per
direction at the flagship batch), writes it to HBM, then reads it four times for
the masked row/column logsumexps.  This kernel computes, for each layer s and
each block of video rows, the [rows, B*N] similarity tile in VMEM and reduces it
immediately:

- row direction (the "which text matches this timestamp" NCE): full-width
  masked logsumexp per row, written per block;
- column direction (the "which timestamp matches this text" NCE): online
  (m, s) logsumexp accumulators carried across row blocks in VMEM scratch —
  the same streaming-softmax recurrence as flash attention.

The [S, B*T, B*N] logits tensor never exists in HBM.  A custom VJP recomputes
the similarity tile in a backward kernel (only features + the four logsumexp
vectors are saved) and emits feature gradients directly, so the fused path is
legal inside the training step.

Masking semantics match losses/tan_loss.py::_milnce_components exactly:
positives = where(pos_mask, sim, mask_value); negatives = where(col_valid, sim,
mask_value); mask_value is the fp16-safe -6e4 of the reference
(train/loss.py:98-100), which keeps fully-masked rows finite.

On non-TPU backends the kernel runs in interpreter mode so the CPU suite tests
the exact kernel code path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _precision(dtype):
    # f32: full-precision MXU passes (match XLA under any global matmul
    # precision default); bf16: single-pass (Mosaic cannot lower 'highest')
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _masked_tiles(v, t, pm_ref, cv_ref, inv_temp, mask_value):
    """Shared fwd/bwd tile math: sim [R, K] fp32 and its pos/neg maskings."""
    sim = (
        jax.lax.dot_general(
            v,
            t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(v.dtype),
        )
        * inv_temp
    )
    pm = pm_ref[...] > 0  # [R, K]
    cv = cv_ref[0] > 0  # [K]
    pos = jnp.where(pm, sim, mask_value)
    neg = jnp.where(cv[None, :], sim, mask_value)
    return pos, neg


def _row_lse(x):
    m = jnp.max(x, axis=-1)
    return m + jnp.log(jnp.sum(jnp.exp(x - m[:, None]), axis=-1))


def _milnce_fwd_kernel(
    v_ref, t_ref, pm_ref, cv_ref,
    vnum_ref, vden_ref, mp_ref, sp_ref, mn_ref, sn_ref,
    m_pos, s_pos, m_neg, s_neg,
    *, inv_temp: float, mask_value: float, nrb: int,
):
    rb = pl.program_id(1)
    pos, neg = _masked_tiles(
        v_ref[0], t_ref[0], pm_ref, cv_ref, inv_temp, mask_value
    )

    # row direction: the whole K axis is resident — direct masked lse.
    # vector outputs ride as [S, nrb, 1, br] so their (1, 1, 1, br) blocks
    # satisfy the TPU (8, 128)-or-equal block rule.
    vnum_ref[0, 0, 0] = _row_lse(pos)
    vden_ref[0, 0, 0] = _row_lse(neg)

    # column direction: streaming (max, sum) recurrence across row blocks.
    # The kernel emits the raw (m, s) pair — the wrapper composes
    # lse = m + log(s) single-chip, or merges partials across devices
    # (pmax/psum) when rows are sharded over a mesh axis.
    bm_p = jnp.max(pos, axis=0)  # [K]
    bs_p = jnp.sum(jnp.exp(pos - bm_p[None, :]), axis=0)
    bm_n = jnp.max(neg, axis=0)
    bs_n = jnp.sum(jnp.exp(neg - bm_n[None, :]), axis=0)

    @pl.when(rb == 0)
    def _init():
        m_pos[0], s_pos[0] = bm_p, bs_p
        m_neg[0], s_neg[0] = bm_n, bs_n

    @pl.when(rb > 0)
    def _accumulate():
        nm = jnp.maximum(m_pos[0], bm_p)
        s_pos[0] = s_pos[0] * jnp.exp(m_pos[0] - nm) + bs_p * jnp.exp(bm_p - nm)
        m_pos[0] = nm
        nm = jnp.maximum(m_neg[0], bm_n)
        s_neg[0] = s_neg[0] * jnp.exp(m_neg[0] - nm) + bs_n * jnp.exp(bm_n - nm)
        m_neg[0] = nm

    @pl.when(rb == nrb - 1)
    def _write():
        mp_ref[0, 0], sp_ref[0, 0] = m_pos[0], s_pos[0]
        mn_ref[0, 0], sn_ref[0, 0] = m_neg[0], s_neg[0]


def _milnce_bwd_kernel(
    v_ref, t_ref, pm_ref, cv_ref,
    vnum_ref, vden_ref, tnum_ref, tden_ref,
    gvn_ref, gvd_ref, gtn_ref, gtd_ref,
    dv_ref, dt_ref,
    acc_ref,
    *, inv_temp: float, mask_value: float, nrb: int,
):
    rb = pl.program_id(1)
    v = v_ref[0]
    t = t_ref[0]
    pos, neg = _masked_tiles(v, t, pm_ref, cv_ref, inv_temp, mask_value)
    pm = pm_ref[...] > 0
    cv = cv_ref[0] > 0

    # softmax probabilities from the saved logsumexps.  All exponents are
    # <= 0 (lse >= every element), so no overflow.  The forward's where()
    # routes ZERO gradient to masked elements (they hold the constant
    # mask_value, not sim), so re-mask the probabilities: for rows with real
    # positives this is a no-op (exp(mask_value - lse) == 0 already), but a
    # fully-masked row's uniform 1/K softmax must not leak into d sim.
    # row vectors ride as [S, nrb, 1, br], column vectors as [S, 1, K].
    p_pos = jnp.where(pm, jnp.exp(pos - vnum_ref[0, 0, 0][:, None]), 0.0)
    p_neg = jnp.where(cv[None, :], jnp.exp(neg - vden_ref[0, 0, 0][:, None]), 0.0)
    q_pos = jnp.where(pm, jnp.exp(pos - tnum_ref[0, 0][None, :]), 0.0)
    q_neg = jnp.where(cv[None, :], jnp.exp(neg - tden_ref[0, 0][None, :]), 0.0)

    dsim = (
        gvn_ref[0, 0, 0][:, None] * p_pos
        + gvd_ref[0, 0, 0][:, None] * p_neg
        + gtn_ref[0, 0][None, :] * q_pos
        + gtd_ref[0, 0][None, :] * q_neg
    ) * inv_temp

    prec = _precision(v.dtype)
    dsim_c = dsim.astype(v.dtype)
    dv_ref[0] = jax.lax.dot_general(
        dsim_c, t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(dv_ref.dtype)

    dt_block = jax.lax.dot_general(
        dsim_c, v,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [K, C]

    @pl.when(rb == 0)
    def _init():
        acc_ref[...] = dt_block

    @pl.when(rb > 0)
    def _accumulate():
        acc_ref[...] += dt_block

    @pl.when(rb == nrb - 1)
    def _write():
        dt_ref[0] = acc_ref[...].astype(dt_ref.dtype)


def _pick_row_block(R: int, K: int, C: int, itemsize: int, bwd: bool):
    """Largest row block that divides R and keeps the working set in VMEM.

    Only 8-divisible blocks are legal on TPU (the (8, 128) block rule — a
    br of 1/2/4 fails Mosaic lowering unless it equals R).  Returns None when
    even br=8 blows the VMEM budget (e.g. K = B*N text columns so large the
    [K, C] text block + f32 accumulator alone exceed it) — callers fall back
    to the XLA logits path (fused_milnce_supported)."""
    # 16 MiB scoped VMEM per core; Mosaic's own overhead eats a few MB, so
    # budget conservatively (measured: B=128 bwd at br=8 wants 16.41 MB —
    # over the limit — because t-in, dt-out (both double-buffered) and the
    # f32 accumulator are each [K, C] with K = B*N = 2048)
    budget = 10 * 1024 * 1024
    fixed = K * C * itemsize * 2  # t block, double-buffered
    if bwd:
        fixed += K * C * (itemsize * 2 + 4)  # dt out (dbl-buf) + f32 acc
    for br in (1024, 512, 256, 128, 64, 32, 16, 8):
        if R % br:
            continue
        tiles = (10 if bwd else 6) * br * K * 4  # fp32 sim/pos/neg/prob tiles
        blocks = br * C * itemsize * (4 if bwd else 2) + br * K * 4
        if fixed + tiles + blocks <= budget:
            return br
    return None


def fused_milnce_supported(R: int, K: int, C: int, itemsize: int) -> bool:
    """True when BOTH the forward and backward kernels have a legal row block
    within the VMEM budget for logits [.., R, K] over C-dim features."""
    return (
        R % 8 == 0
        and _pick_row_block(R, K, C, itemsize, False) is not None
        and _pick_row_block(R, K, C, itemsize, True) is not None
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "inv_temp", "mask_value", "br")
)
def _fwd_call(v, t, pm, cv, interpret, inv_temp, mask_value, br):
    S, R, C = v.shape
    K = t.shape[1]
    nrb = R // br
    f32 = jnp.float32
    kern = functools.partial(
        _milnce_fwd_kernel, inv_temp=inv_temp, mask_value=mask_value, nrb=nrb
    )
    # vector outputs as [S, nrb, 1, br] / [S, 1, K]: blocks whose last two
    # dims EQUAL the array dims, satisfying the TPU (8, 128) block rule
    row_out = lambda: pl.BlockSpec(
        (1, 1, 1, br), lambda s, rb: (s, rb, 0, 0), memory_space=pltpu.VMEM
    )
    col_out = lambda: pl.BlockSpec(
        (1, 1, K), lambda s, rb: (s, 0, 0), memory_space=pltpu.VMEM
    )
    vnum, vden, mp, sp, mn, sn = pl.pallas_call(
        kern,
        grid=(S, nrb),
        in_specs=[
            pl.BlockSpec((1, br, C), lambda s, rb: (s, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, C), lambda s, rb: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, K), lambda s, rb: (rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda s, rb: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_out(), row_out(), col_out(), col_out(), col_out(), col_out()),
        out_shape=(
            jax.ShapeDtypeStruct((S, nrb, 1, br), f32),
            jax.ShapeDtypeStruct((S, nrb, 1, br), f32),
            jax.ShapeDtypeStruct((S, 1, K), f32),
            jax.ShapeDtypeStruct((S, 1, K), f32),
            jax.ShapeDtypeStruct((S, 1, K), f32),
            jax.ShapeDtypeStruct((S, 1, K), f32),
        ),
        scratch_shapes=[pltpu.VMEM((1, K), f32) for _ in range(4)],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * R * K * C,
            bytes_accessed=(S * (R + K) * C + R * K) * v.dtype.itemsize,
            transcendentals=2 * S * R * K,
        ),
        interpret=interpret,
    )(v, t, pm, cv)
    return (
        vnum.reshape(S, R),
        vden.reshape(S, R),
        mp.reshape(S, K),
        sp.reshape(S, K),
        mn.reshape(S, K),
        sn.reshape(S, K),
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "inv_temp", "mask_value", "br")
)
def _bwd_call(v, t, pm, cv, vnum, vden, tnum, tden, gvn, gvd, gtn, gtd,
              interpret, inv_temp, mask_value, br):
    S, R, C = v.shape
    K = t.shape[1]
    nrb = R // br
    kern = functools.partial(
        _milnce_bwd_kernel, inv_temp=inv_temp, mask_value=mask_value, nrb=nrb
    )
    # vectors reshaped to [S, nrb, 1, br] / [S, 1, K] (see _fwd_call)
    row_vec = lambda: pl.BlockSpec(
        (1, 1, 1, br), lambda s, rb: (s, rb, 0, 0), memory_space=pltpu.VMEM
    )
    col_vec = lambda: pl.BlockSpec(
        (1, 1, K), lambda s, rb: (s, 0, 0), memory_space=pltpu.VMEM
    )
    rv = lambda x: x.reshape(S, nrb, 1, br)
    cvec = lambda x: x.reshape(S, 1, K)
    return pl.pallas_call(
        kern,
        grid=(S, nrb),
        in_specs=[
            pl.BlockSpec((1, br, C), lambda s, rb: (s, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, C), lambda s, rb: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, K), lambda s, rb: (rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda s, rb: (0, 0), memory_space=pltpu.VMEM),
            row_vec(), row_vec(), col_vec(), col_vec(),  # saved lse
            row_vec(), row_vec(), col_vec(), col_vec(),  # cotangents
        ],
        out_specs=(
            pl.BlockSpec((1, br, C), lambda s, rb: (s, rb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, C), lambda s, rb: (s, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(t.shape, t.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((K, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * S * R * K * C,
            bytes_accessed=(3 * S * (R + K) * C + R * K) * v.dtype.itemsize,
            transcendentals=4 * S * R * K,
        ),
        interpret=interpret,
    )(
        v, t, pm, cv,
        rv(vnum), rv(vden), cvec(tnum), cvec(tden),
        rv(gvn), rv(gvd), cvec(gtn), cvec(gtd),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _milnce_core(interpret: bool, inv_temp: float, mask_value: float,
                 v, t, pm, cv):
    out, _ = _milnce_core_fwd(interpret, inv_temp, mask_value, v, t, pm, cv)
    return out


def _milnce_core_fwd(interpret, inv_temp, mask_value, v, t, pm, cv):
    br = _pick_row_block(v.shape[1], t.shape[1], v.shape[2], v.dtype.itemsize, False)
    vnum, vden, mp, sp, mn, sn = _fwd_call(
        v, t, pm, cv, interpret, inv_temp, mask_value, br
    )
    tnum = mp + jnp.log(sp)
    tden = mn + jnp.log(sn)
    out = (vnum, vden, tnum, tden)
    return out, (v, t, pm, cv, out)


def _milnce_core_bwd(interpret, inv_temp, mask_value, res, g):
    v, t, pm, cv, (vnum, vden, tnum, tden) = res
    gvn, gvd, gtn, gtd = g
    br = _pick_row_block(v.shape[1], t.shape[1], v.shape[2], v.dtype.itemsize, True)
    dv, dt = _bwd_call(
        v, t, pm, cv, vnum, vden, tnum, tden,
        gvn, gvd, gtn, gtd, interpret, inv_temp, mask_value, br,
    )
    # pm / cv are float masks derived from booleans — no gradient
    return dv, dt, jnp.zeros_like(pm), jnp.zeros_like(cv)


_milnce_core.defvjp(_milnce_core_fwd, _milnce_core_bwd)


# --------------------------------------------------------------- sharded core
#
# Multi-chip variant: rows (the flattened B*T window axis) arrive sharded over
# a mesh axis; text columns arrive sharded over the same axis (batch dim).
# Per shard_map block:
#   fwd: all-gather text -> local kernel over local rows x ALL columns ->
#        row lse is purely local; column lse merges the per-device (m, s)
#        streaming partials with pmax + psum (the same recurrence the kernel
#        runs across row blocks, lifted to the mesh axis).
#   bwd: local backward kernel (global tnum/tden ride in the residuals;
#        cotangents of the replicated t_el are replicated) -> dv stays local,
#        dt partials reduce-scatter back to each device's column shard.
# This is the NCCL-allreduce-free TPU shape of the reference's DDP global
# in-batch negatives (train/main.py DDP + loss.py:240-275).


def _sharded_milnce(mesh, axis, interpret, inv_temp, mask_value, v, t, pm, cv):
    from jax.sharding import PartitionSpec as P

    ndev = mesh.shape[axis]

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def core(v, t, pm, cv):
        out, _ = core_fwd(v, t, pm, cv)
        return out

    def local_fwd(v_l, t_l, pm_l, cv_g):
        t_g = jax.lax.all_gather(t_l, axis, axis=1, tiled=True)
        br = _pick_row_block(
            v_l.shape[1], t_g.shape[1], v_l.shape[2], v_l.dtype.itemsize, False
        )
        vnum, vden, mp, sp, mn, sn = _fwd_call(
            v_l, t_g, pm_l, cv_g, interpret, inv_temp, mask_value, br
        )
        # merge the streaming-lse partials across devices
        gmp = jax.lax.pmax(mp, axis)
        gmn = jax.lax.pmax(mn, axis)
        tnum = gmp + jnp.log(jax.lax.psum(sp * jnp.exp(mp - gmp), axis))
        tden = gmn + jnp.log(jax.lax.psum(sn * jnp.exp(mn - gmn), axis))
        return vnum, vden, tnum, tden

    def local_bwd(v_l, t_l, pm_l, cv_g, vnum, vden, tnum, tden,
                  gvn, gvd, gtn, gtd):
        t_g = jax.lax.all_gather(t_l, axis, axis=1, tiled=True)
        br = _pick_row_block(
            v_l.shape[1], t_g.shape[1], v_l.shape[2], v_l.dtype.itemsize, True
        )
        dv, dt_part = _bwd_call(
            v_l, t_g, pm_l, cv_g, vnum, vden, tnum, tden,
            gvn, gvd, gtn, gtd, interpret, inv_temp, mask_value, br,
        )
        # dt_part sums this device's rows only; reduce-scatter the global sum
        # back to each device's own column shard
        dt = jax.lax.psum_scatter(dt_part, axis, scatter_dimension=1, tiled=True)
        return dv, dt

    shmap = functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False
    )
    row_spec = P(None, axis)
    t_spec = P(None, axis, None)

    def core_fwd(v, t, pm, cv):
        out = shmap(
            local_fwd,
            in_specs=(P(None, axis, None), t_spec, P(axis, None), P(None, None)),
            out_specs=(row_spec, row_spec, P(None, None), P(None, None)),
        )(v, t, pm, cv)
        return out, (v, t, pm, cv, out)

    def core_bwd(res, g):
        v, t, pm, cv, (vnum, vden, tnum, tden) = res
        gvn, gvd, gtn, gtd = g
        dv, dt = shmap(
            local_bwd,
            in_specs=(
                P(None, axis, None), t_spec, P(axis, None), P(None, None),
                row_spec, row_spec, P(None, None), P(None, None),
                row_spec, row_spec, P(None, None), P(None, None),
            ),
            out_specs=(P(None, axis, None), t_spec),
        )(v, t, pm, cv, vnum, vden, tnum, tden, gvn, gvd, gtn, gtd)
        return dv, dt, jnp.zeros_like(pm), jnp.zeros_like(cv)

    core.defvjp(core_fwd, core_bwd)
    return core(v, t, pm, cv)


def fused_milnce_elements(
    video: jnp.ndarray,  # [S, R, C] per-layer L2-normalized video features
    text: jnp.ndarray,  # [S, K, C] (joint) or [K, C] (dual, shared over layers)
    pos_mask: jnp.ndarray,  # [R, K] bool — target positives (col-valid applied)
    col_valid: jnp.ndarray,  # [K] bool — non-padded text columns
    mask_value: float,
    inv_temp: float = 1.0,
    mesh=None,
    data_axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-direction MIL-NCE loss elements without materializing the logits.

    Returns (v_el [S, R], t_el [S, K]) == the (v_den - v_num, t_den - t_num) of
    losses/tan_loss.py::_milnce_components on logits = inv_temp * video @ text^T.
    Differentiable w.r.t. both feature tensors.

    With ``mesh`` (and the batch sharded over ``data_axis``), the kernel runs
    per-device on local rows via shard_map; column logsumexps merge across
    devices (pmax/psum of the streaming partials) and the text gradient
    reduce-scatters — global in-batch negatives without the logits tensor.
    """
    if text.ndim == 2:
        # dual branch: one text tower output shared across layers; broadcast_to
        # is free under jit and its VJP sums the per-layer text gradients
        text = jnp.broadcast_to(text[None], (video.shape[0],) + text.shape)
    interpret = jax.default_backend() != "tpu"

    S, R, C = video.shape
    K = text.shape[1]
    ndev = mesh.shape.get(data_axis, 1) if mesh is not None else 1
    if not fused_milnce_supported(R // ndev, K, C, video.dtype.itemsize):
        # K = B*N text columns too large for the kernel's VMEM working set
        # (e.g. batch 256 at width 512): fall back to the dense masked
        # logsumexps — same math, logits materialized, GSPMD-shardable
        sim = inv_temp * jnp.einsum(
            "src,skc->srk", video, text.astype(video.dtype)
        ).astype(jnp.float32)
        pos = jnp.where(pos_mask[None], sim, mask_value)
        neg = jnp.where(col_valid[None, None, :], sim, mask_value)
        from jax.scipy.special import logsumexp

        v_el = logsumexp(neg, axis=2) - logsumexp(pos, axis=2)
        t_el = logsumexp(neg, axis=1) - logsumexp(pos, axis=1)
        return v_el, t_el

    pm = pos_mask.astype(jnp.float32)
    cv = col_valid.astype(jnp.float32)[None, :]
    if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
        vnum, vden, tnum, tden = _sharded_milnce(
            mesh, data_axis, interpret, float(inv_temp), float(mask_value),
            video, text, pm, cv,
        )
    else:
        vnum, vden, tnum, tden = _milnce_core(
            interpret, float(inv_temp), float(mask_value), video, text, pm, cv
        )
    return vden - vnum, tden - tnum
