"""Fused Pallas TPU kernel for the EGNN per-edge message path.

Why this kernel exists
----------------------
The EGNN denoiser (reference semantics: ``/root/reference/src/mlconfgen/egnn.py``
GCL :38-85, EquivariantUpdate :111-149) is dominated by per-edge MLPs over the
complete graph: every pass materialises ``(B, N^2, H)`` tensors (H=420,
N=42 -> 1764 edges/graph). Under plain XLA each GCL writes/reads ~6 such
tensors to HBM (dot operands cannot fuse through elementwise producers), which
makes the whole sampler HBM-bandwidth-bound. This kernel keeps the entire edge
stream resident in VMEM: it consumes only the per-*node* projections
``u = h @ W_src``, ``v = h @ W_tgt`` (B*N rows) plus the tiny per-edge scalars,
and emits only the per-node aggregate — a ~30x cut in HBM traffic that moves
the model from bandwidth-bound to MXU-bound.

Kernel construction notes (TPU/Mosaic):

* The edge-row expansion ``pre[k] = u[k // N] + v[k % N]`` is a broadcast and
  a leading-dim collapse (pure data movement in VMEM — an earlier variant
  used 0/1 selection-matrix matmuls, which cost +100% padded MXU FLOPs); the
  j-aggregation is a float32 sublane reduction (parity with the reference's
  f32 ``scatter_add``). The H->1 scalar heads are VPU lane reductions, not
  1-wide (i.e. 128-padded) MXU dots.
* One grid step per batch element; Pallas double-buffers the next element's
  DMA behind the current GEMMs.
* Matmuls request ``preferred_element_type=float32``; in bfloat16 mode the
  operands are bf16 (full-rate MXU) and the accumulator f32, matching the
  XLA path in ``models/egnn.py``.

Measured verdict (v5e, B=128, N=42, H=420, bf16; scan-amortized via
``scripts/kernel_microbench.py`` — per-call timing is polluted by ~1.4 ms of
axon-tunnel dispatch latency):

* XLA dense path 1.39 ms/GCL-pass, this kernel 1.96 ms/GCL-pass.
* Why the fusion doesn't win here: the XLA path is already within ~1.4x of
  its HBM floor and overlaps HBM streaming with MXU work, while inside one
  Pallas grid step the MXU phases (main GEMM ~4.7 us + sel-expansion GEMM
  ~1.2 us per batch element, both at 420->512 lane padding) and the VPU
  phases (two SiLUs, sigmoid gate, masked j-sum, ~3-5 us) execute serially,
  so the kernel's floor is ~= XLA parity, not the 2-3x a pure-bandwidth
  model predicts. Beating XLA would need cross-phase software pipelining
  (``pltpu.emit_pipeline``) — not worth it at this model size.
* Also measured and rejected: a two-stage software pipeline over the grid
  (element b's GEMMs staged into double-buffered VMEM scratch, element
  b-1's VPU epilogue in the same step, lagged out/em index maps) — 1.96 ms
  with ``@pl.when`` stage guards and 1.96 ms as one straight-line block,
  i.e. Mosaic's scheduler does not interleave the independent MXU and VPU
  chains of consecutive grid steps; only an explicit inner
  ``pltpu.emit_pipeline`` would.
* Hence ``EGNNConfig.use_pallas`` defaults to "off"; the kernel remains as
  the building block for the mega-batch edge-stream regime (SURVEY.md §7
  step 2) and as a Pallas reference implementation, and stays covered by
  ``tests/test_pallas_kernel.py`` in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def _silu(x):
    # x / (1 + exp(-x)): identical to x * sigmoid(x) but avoids the
    # `logistic` op, whose bf16 Mosaic lowering is broken (vector.broadcast
    # verification error); in bf16 this halves VPU elementwise time vs
    # computing the activation in f32 (2.35 vs 2.9 ms/GCL-pass at B=128).
    return x / (1 + jnp.exp(-x))


def _edge_kernel(u_ref, v_ref, ef_ref, em_ref, w_e_ref, b0_ref, w1_ref,
                 b1_ref, wh_ref, bh_ref, out_ref, *, mode: str, n_nodes: int,
                 norm: float, cd):
    """One batch element of the fused edge-MLP pass.

    u, v: (N, H) per-node source/target projections of the first edge-MLP
    layer (split-weight form of Linear([h_i, h_j, e_ij]) — reference
    ``egnn.py:38-52``); ef: (N^2, E) per-edge scalars; em: (N^2, 1) edge mask.
    mode "gcl": out (N, H) = masked, sigmoid-gated j-sum of messages / norm.
    mode "coord": out (N^2, 1) = raw scalar head (gating/aggregation of the
    geometric part stays outside in f32 — reference ``egnn.py:136-146``).
    """
    N = n_nodes
    NE = N * N
    f32 = jnp.float32
    H = u_ref.shape[-1]

    u = u_ref[0]
    v = v_ref[0]
    ef = ef_ref[0]

    # Edge-row expansion pre[i*N+j] = u[i] + v[j] (+ per-edge scalars).
    # v's tile pattern (row k = v[k % N]) is a native pltpu.repeat; u's
    # element-repeat pattern (row k = u[k // N]) is a 0/1 selection-matrix
    # matmul — Mosaic rejects the broadcast+collapse and jnp.repeat lowerings
    # of this pattern, and the selection GEMM costs only ~25% of the main
    # edge-MLP GEMM.
    edge_row = jax.lax.broadcasted_iota(jnp.int32, (NE, N), 0)
    node_col = jax.lax.broadcasted_iota(jnp.int32, (NE, N), 1)
    sel_i = (edge_row // N == node_col).astype(cd)
    v_tile = pltpu.repeat(v, N, axis=0)
    pre = (jnp.dot(sel_i, u, preferred_element_type=f32)
           + v_tile.astype(f32)
           + jnp.dot(ef, w_e_ref[:], preferred_element_type=f32)
           + b0_ref[:].astype(f32))
    m1 = _silu(pre.astype(cd))
    m2 = _silu((jnp.dot(m1, w1_ref[:], preferred_element_type=f32)
                + b1_ref[:].astype(f32)).astype(cd))
    # Scalar head (H -> 1): a lane reduction on the VPU; an MXU dot would pad
    # the 1-wide output to 128 lanes (+25% padded FLOPs for nothing).
    head = (jnp.sum(m2.astype(f32) * wh_ref[:].reshape(1, H).astype(f32),
                    axis=1, keepdims=True)
            + bh_ref[:].astype(f32))                  # (NE, 1)

    if mode == "coord":
        out_ref[0] = head
        return

    gate = jax.nn.sigmoid(head).astype(cd)
    msg = m2 * gate * em_ref[0]
    # agg[i] = sum_j msg[i*N+j]: expand + f32 sublane reduction (parity with
    # the reference's f32 scatter_add, egnn.py:418-437).
    out_ref[0] = (jnp.sum(msg.reshape(N, N, H), axis=1, dtype=f32) / norm)


@functools.partial(jax.jit, static_argnames=("mode", "norm", "interpret"))
def fused_edge_pass(u: jnp.ndarray, v: jnp.ndarray, ef: jnp.ndarray,
                    em: jnp.ndarray, w_e: jnp.ndarray, b0: jnp.ndarray,
                    w1: jnp.ndarray, b1: jnp.ndarray, wh: jnp.ndarray,
                    bh: jnp.ndarray, *, mode: str = "gcl",
                    norm: float = 100.0, interpret: bool = False):
    """Batched fused edge-MLP pass.

    u, v: (B, N, H); ef: (B, N^2, E); em: (B, N^2, 1) in compute dtype.
    Weights in compute dtype; biases may be any float dtype (cast to f32).
    Returns float32 (B, N, H) for mode "gcl", (B, N^2, 1) for mode "coord".
    """
    B, N, H = u.shape
    NE = N * N
    E = ef.shape[-1]
    cd = u.dtype

    out_shape = ((B, N, H) if mode == "gcl" else (B, NE, 1))

    batch3 = lambda s: pl.BlockSpec((1,) + s, lambda b: (b, 0, 0),
                                    memory_space=pltpu.VMEM)
    const2 = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)

    flops = B * 2 * NE * (H * H + N * H + E * H + 2 * H)
    if mode == "gcl":
        flops += B * NE * H

    return pl.pallas_call(
        functools.partial(_edge_kernel, mode=mode, n_nodes=N, norm=norm,
                          cd=cd),
        grid=(B,),
        in_specs=[
            batch3((N, H)),        # u
            batch3((N, H)),        # v
            batch3((NE, E)),       # ef
            batch3((NE, 1)),       # em
            const2((E, H)),        # w_e
            const2((1, H)),        # b0
            const2((H, H)),        # w1
            const2((1, H)),        # b1
            const2((H, 1)),        # wh
            const2((1, 1)),        # bh
        ],
        out_specs=batch3(out_shape[1:]),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * (2 * N * H + NE * E + NE + N * H) * 4,
            transcendentals=B * NE * (2 * H + 1),
        ),
        interpret=interpret,
    )(u, v, ef, em, w_e, b0, w1, b1, wh, bh)


def _as_2d_bias(b: jnp.ndarray, width: int, dtype) -> jnp.ndarray:
    if b is None:
        return jnp.zeros((1, width), dtype=dtype)
    return jnp.reshape(b, (1, width)).astype(dtype)


def gcl_edge_aggregate(params: Params, h: jnp.ndarray, edge_feat: jnp.ndarray,
                       edge_mask: jnp.ndarray, norm: float,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused computation of the GCL edge aggregate.

    Equivalent to the XLA path in ``models.egnn.gcl_forward`` up to (and
    including) the masked, gated j-sum: returns ``agg`` (B, N, H) in h.dtype.
    h: (B, N, H); edge_feat: (B, N, N, E); edge_mask: (B, N, N, 1).
    """
    B, N, H = h.shape
    p0, p1, att = params["edge_0"], params["edge_1"], params["att"]
    cd = h.dtype
    u = h @ p0["w"][:H]
    v = h @ p0["w"][H:2 * H]
    w_e = p0["w"][2 * H:]
    ef = edge_feat.reshape(B, N * N, -1).astype(cd)
    em = edge_mask.reshape(B, N * N, 1).astype(cd)
    agg = fused_edge_pass(
        u, v, ef, em, w_e, _as_2d_bias(p0.get("b"), H, jnp.float32),
        p1["w"], _as_2d_bias(p1.get("b"), H, jnp.float32),
        att["w"], _as_2d_bias(att.get("b"), 1, jnp.float32),
        mode="gcl", norm=norm, interpret=interpret)
    return agg.astype(cd)


def coord_edge_scalars(params: Params, h: jnp.ndarray, edge_feat: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused per-edge scalar head of the equivariant coordinate update.

    Returns ``scal`` (B, N, N, 1) float32 — the ``m @ coord_out`` scalars of
    ``models.egnn.coord_update_forward`` (reference ``egnn.py:111-135``); the
    f32 geometric part (coord_diff * scal, mask, j-sum) stays in XLA.
    """
    B, N, H = h.shape
    p0, p1, out = params["coord_0"], params["coord_1"], params["coord_out"]
    cd = h.dtype
    u = h @ p0["w"][:H]
    v = h @ p0["w"][H:2 * H]
    w_e = p0["w"][2 * H:]
    ef = edge_feat.reshape(B, N * N, -1).astype(cd)
    em = jnp.zeros((B, N * N, 1), dtype=cd)   # unused in coord mode
    scal = fused_edge_pass(
        u, v, ef, em, w_e, _as_2d_bias(p0.get("b"), H, jnp.float32),
        p1["w"], _as_2d_bias(p1.get("b"), H, jnp.float32),
        out["w"], _as_2d_bias(out.get("b"), 1, jnp.float32),
        mode="coord", interpret=interpret)
    return scal.reshape(B, N, N, 1)
