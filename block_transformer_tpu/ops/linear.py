"""Unified linear application: fp, INT8, or INT4 weight-only quantized.

Every matmul in the model goes through ``apply_linear`` so quantization is
a pure parameter-tree transformation (ops/quant.quantize_model_params) —
model code never branches on precision. On TPU the quantized paths call the
fused Pallas dequant-matmul (ops/dequant_matmul.py); elsewhere (CPU tests)
they fall back to an XLA dequant+dot that is numerically identical.

Layer-scanned stacks use the **stacked view**: ``StackedLinear(node,
layer)`` wraps the whole ``[L, ...]`` parameter node plus a traced layer
index, and the Pallas kernels select the layer inside their index maps
(scalar prefetch) so no per-layer weight slice is ever materialized in HBM
— the fix that takes the fused kernels from 2x-slower to faster than
XLA's convert+dot on the decode path (see ops/dequant_matmul.py).

Dispatch is **M-aware**: the Pallas kernels only run for decode-sized
activations (M <= BT_PALLAS_M_MAX, default 512), where the matmul is
weight-streaming-bound and the int8/int4 stream at half/quarter bf16 bytes
pays off. Prefill-sized M (batch x chunk rows, e.g. 32768 at b256) is
compute-bound on the MXU — XLA's fused convert+dot tiles those shapes
better, and the quantized weights only cost one in-flight convert.

Prefill-sized INT8 matmuls (M >= BT_W8A8_M_MIN) additionally quantize the
*activations* per row and issue a native s8 x s8 MXU dot (W8A8): the v5e
MXU runs int8 at ~1.8x its bf16 rate, and at prefill M the matmul is
compute-bound, so dynamic activation quant is a straight win (measured
per-shape in scripts/w8a8_probe3.py: QKV 1.45x, MLP-up 1.58x, MLP-down
1.17x, attn-out 1.24x). The threshold default is M >= 384: the original
2048 floor assumed decode-sized M is weight-streaming-bound, but the
end-to-end race at the b384 headline regime falsified that — W8A8 on the
decode matmuls measures 13,452 vs 12,768 tok/s (+5.4%, BENCH_DETAIL_
w8a8_decode.json); at batch >= ~256 the decode matmuls are already
MXU-compute-bound (RESULTS.md) so the 1.8x int8 MXU rate pays there too.
Small-M decode (serving engine at b16, M << 384) stays on convert+dot,
where weight streaming dominates and quant work only adds latency. The
path exists only for already-INT8 weights, so training (fp params) is
never affected.

Env switches (measured defaults; see RESULTS.md kernel-dispatch table):
  BT_PALLAS_INT8=1    enable the Pallas int8 kernel (default: XLA
                      convert+dot, which measured faster at every M)
  BT_PALLAS_INT4=0    disable the Pallas int4 kernel (XLA dequant+dot)
  BT_PALLAS_M_MAX=n   Pallas/XLA crossover row count (default 512)
  BT_PALLAS_QKV=1     allow the int8 kernel on the fused-QKV (N=3K) shape
  BT_W8A8=0           disable W8A8 prefill matmuls (default: on for TPU
                      int8-weight matmuls with M >= BT_W8A8_M_MIN)
  BT_W8A8_M_MIN=n     W8A8 row-count threshold (default 384: decode at
                      the headline batch included — PASS +0.307% under
                      the round-4 uniform decode gate; 2048 = prefill
                      only; see _use_w8a8)
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import quant

# Trace-time switch: ``pallas_call`` has no GSPMD partitioning rule, so
# programs that will run under a sharded jit (mesh serving) must dispatch
# every quantized matmul to the XLA dequant+dot, which GSPMD partitions
# like any dot. Per-shard Pallas under shard_map is the round-3 lead.
_NO_PALLAS = contextvars.ContextVar("bt_no_pallas", default=False)


@contextlib.contextmanager
def pallas_disabled():
    """Dispatch all quantized matmuls to XLA inside this context (checked
    at trace time — wrap the *calls* into jitted programs, e.g. a mesh
    engine's prefill/decode dispatches)."""
    tok = _NO_PALLAS.set(True)
    try:
        yield
    finally:
        _NO_PALLAS.reset(tok)


def pallas_allowed() -> bool:
    """False when tracing for a GSPMD-sharded program: inside
    ``pallas_disabled`` (the mesh engine's dispatches) or under an active
    ``set_mesh`` scope with Auto/Explicit axes (static sharded
    generate/train) — GSPMD cannot partition a pallas_call, so those
    programs must take the XLA paths. Inside a ``shard_map`` body every
    mesh axis is Manual and the kernel runs per shard on local shapes —
    Pallas stays on there (parallel/tp_decode.py relies on this)."""
    if _NO_PALLAS.get():
        return False
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is not None and mesh.axis_names:
            from jax.sharding import AxisType
            if any(t != AxisType.Manual for t in mesh.axis_types):
                return False
    except Exception:
        pass
    return True


# Trace-time KV-mode hint for pairing-aware W8A8 dispatch (VERDICT r4
# weak 2): the 85M uniform decode gate passes W8A8-decode in the INT4-KV
# pairing (+0.483%) but fails it with INT8 KV (+0.507%) — the caveat used
# to live only in prose while the dispatch stayed global. Inference entry
# points (generate_blocks, the serving engine) now declare their KV mode
# around tracing, and _use_w8a8 keys its default threshold off it.
_KV_MODE = contextvars.ContextVar("bt_kv_mode", default=None)


@contextlib.contextmanager
def kv_mode(mode):
    """Declare the decode KV-cache mode ('bf16'/'int8'/'int4'/'paged'/None)
    for quantized-matmul dispatch decisions made while tracing inside."""
    tok = _KV_MODE.set(mode)
    try:
        yield
    finally:
        _KV_MODE.reset(tok)


class StackedLinear(NamedTuple):
    """View of one layer inside a stacked ``[L, ...]`` linear param node."""
    node: dict
    layer: jax.Array


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# Measured defaults (bench.py ablations + profiler traces, b256
# p2048/d128 int8+int8KV, v5e via this platform — RESULTS.md tables):
#   INT8 stacked (layer-scanned weights): XLA's convert+dot fuses the
#         dequant into the dot and wins at every M (10,911 vs 10,528
#         tok/s even with Pallas restricted to its best shapes) —
#         Pallas opt-in via BT_PALLAS_INT8=1.
#   INT8 unstacked (LM head / expansion): raced separately
#         (BT_PALLAS_INT8_SINGLE=1): the N=50304 head tiles poorly for
#         the Pallas stream (bn snaps to 384 -> 524 grid steps) and
#         measured 10,839 vs 10,912 tok/s, so XLA stays the default here
#         too. (An unquantized bf16 head — quantize_block_transformer
#         skip_lm_head — also measured neutral: 10,860.)
#   INT4: the Pallas kernel is the default at decode M — XLA has no
#         fused int4 path at all.
_DEFAULTS = {"INT8": "0", "INT8_SINGLE": "0", "INT4": "1"}


def _use_pallas(kind: str, m: int, k: int = 0, n: int = 0,
                stacked: bool = True) -> bool:
    if not pallas_allowed() or not _on_tpu():
        return False
    env_kind = "INT8_SINGLE" if kind == "INT8" and not stacked else kind
    if os.environ.get(f"BT_PALLAS_{env_kind}",
                      _DEFAULTS[env_kind]) == "0":
        return False
    if m > int(os.environ.get("BT_PALLAS_M_MAX", "512")):
        return False
    # int8 fused-QKV shape (N = 3K): the one decode shape where the Pallas
    # stream loses its microbench outright (25.6us vs 7.5us) — excluded
    # even when BT_PALLAS_INT8=1. (INT4 wins this shape; not excluded.)
    if (kind == "INT8" and stacked and n == 3 * k
            and os.environ.get("BT_PALLAS_QKV", "0") != "1"):
        return False
    return True


def _slice(a, i):
    return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)


def _use_w8a8(m: int) -> bool:
    if not _on_tpu() or os.environ.get("BT_W8A8", "1") == "0":
        return False
    # Never inside a shard_map (Manual-mesh) body: row-parallel matmuls
    # (attn-out / MLP-down, K-sharded per tp_param_specs) see only a
    # K-slice of each activation row there, so the per-row dynamic amax
    # would diverge from the single-device full-row scale — silently
    # breaking the asserted token-exactness of TP decode vs single-device
    # (apply_linear cannot tell column- from row-parallel call sites, so
    # the conservative gate covers both).
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is not None and mesh.axis_names:
            from jax.sharding import AxisType
            if any(t == AxisType.Manual for t in mesh.axis_types):
                return False
    except Exception:
        pass
    # Explicit BT_W8A8_M_MIN always wins (racing/probes/gates).
    env = os.environ.get("BT_W8A8_M_MIN")
    if env is not None:
        return m >= int(env)
    # Pairing-aware default (VERDICT r4 item 4): W8A8-decode is judged by
    # the ONE uniform decode gate (scripts/decode_gate.py — fp32-scored
    # continuation logprob delta), repeated over 3 disjoint prompt seeds
    # on the 85M checkpoint (round 5). The w8a8+int8KV pairing measures
    # 0.507/0.533/0.049% (pooled 0.36 +/- 0.27 — the bar sits inside the
    # noise band), so with an INT8 KV cache declared (ops.linear.kv_mode,
    # set by the generate/engine entry points) the serving default stays
    # conservative: prefill-only W8A8 (M >= 2048, ppl gate -0.011%).
    # Every other pairing keeps decode included at M >= 384 (+5.4% tok/s
    # at the b384 max-throughput point — itself an opt-in config whose
    # own KV rows are noise-dominated; QUALITY.md round-5 table).
    # History: round 3 reverted 384 -> 2048 on a 79.3% greedy-agreement
    # reading; round 4's gate re-derived 384; round 5 measured the
    # gate's own sigma and made the int8-KV caveat mechanical. Seeds:
    # results/decode_gate_85m_seeds.json.
    default = 2048 if _KV_MODE.get() == "int8" else 384
    return m >= default


def _w8a8_dot(x2: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """Dynamic per-row activation quant + native s8 x s8 MXU dot.

    out = (round(x / sx) @ w_q) * sx * scale, sx = rowmax(|x|)/127.
    The int8 dot runs at ~1.8x the bf16 MXU rate on v5e; the quant and
    rescale are elementwise and fuse into neighbours. Numerics: activations
    get ~7 bits per row (symmetric, dynamic), weights keep their
    per-channel scale — measured end-to-end ppl impact in QUALITY.md.
    """
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    sx = amax.astype(jnp.float32) / 127.0 + 1e-12
    xq = jnp.round(x2.astype(jnp.float32) / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * scale).astype(x2.dtype)


def apply_linear(x: jax.Array, p, use_pallas: bool = None) -> jax.Array:
    """x [..., K] @ params -> [..., N] (+ bias if present).

    ``p`` is a linear param dict ({"kernel"| "kernel_q8"| "kernel_q4",
    "scale"?, "bias"?}) or a ``StackedLinear`` view of one layer in a
    stacked node.
    """
    if isinstance(p, StackedLinear):
        return _apply_stacked(x, p.node, p.layer, use_pallas)
    if "kernel" in p:
        out = jnp.dot(x, p["kernel"], preferred_element_type=x.dtype)
    elif "kernel_q8" in p:
        out = _int8_matmul(x, p["kernel_q8"], p["scale"], use_pallas)
    elif "kernel_q4" in p:
        out = _int4_matmul(x, p["kernel_q4"], p["scale"], use_pallas)
    else:
        raise KeyError(f"no kernel in linear params: {list(p)}")
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def _flat(x):
    return x.reshape(-1, x.shape[-1]), x.shape[:-1]


def _apply_stacked(x, node, layer, use_pallas):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if "kernel" in node:
        w = _slice(node["kernel"], layer)     # XLA fuses the slice into dot
        out = jnp.dot(x2, w, preferred_element_type=x.dtype)
    elif "kernel_q8" in node:
        _, K, N = node["kernel_q8"].shape
        ok = use_pallas if use_pallas is not None else (
            _use_pallas("INT8", x2.shape[0], K, N)
            and K % 128 == 0 and N % 128 == 0)
        if ok:
            from block_transformer_tpu.ops import dequant_matmul
            out = dequant_matmul.int8_matmul_stacked(
                x2, node["kernel_q8"], node["scale"], layer)
        elif use_pallas is None and _use_w8a8(x2.shape[0]):
            out = _w8a8_dot(x2, _slice(node["kernel_q8"], layer),
                            _slice(node["scale"], layer))
        else:
            w = _slice(node["kernel_q8"], layer)
            s = _slice(node["scale"], layer)
            out = (jnp.dot(x2, w.astype(x.dtype),
                           preferred_element_type=jnp.float32)
                   * s).astype(x.dtype)
    elif "kernel_q4" in node:
        _, Kh, N = node["kernel_q4"].shape
        G = node["scale"].shape[1] if node["scale"].ndim == 3 else 1
        ok = use_pallas if use_pallas is not None else (
            _use_pallas("INT4", x2.shape[0], 2 * Kh, N)
            and Kh % 128 == 0 and N % 128 == 0
            and (G == 1 or ((2 * Kh // G) % 128 == 0
                            and Kh % (2 * Kh // G) == 0)))
        if ok:
            from block_transformer_tpu.ops import dequant_matmul
            out = dequant_matmul.int4_matmul_stacked(
                x2, node["kernel_q4"], node["scale"], layer)
        else:
            w = quant.dequantize_int4(_slice(node["kernel_q4"], layer),
                                      _slice(node["scale"], layer), x.dtype)
            out = jnp.dot(x2, w, preferred_element_type=x.dtype)
    else:
        raise KeyError(f"no kernel in stacked linear params: {list(node)}")
    if "bias" in node:
        out = out + _slice(node["bias"], layer).astype(out.dtype)
    return out.reshape(lead + (out.shape[-1],))


def _int8_matmul(x, w_q, scale, use_pallas):
    K, N = w_q.shape
    x2, lead = _flat(x)
    auto = use_pallas is None
    if auto:
        use_pallas = (_use_pallas("INT8", x2.shape[0], K, N, stacked=False)
                      and K % 128 == 0 and N % 128 == 0)
    if use_pallas:
        from block_transformer_tpu.ops import dequant_matmul
        out = dequant_matmul.int8_matmul(x2, w_q, scale)
    elif auto and _use_w8a8(x2.shape[0]):
        out = _w8a8_dot(x2, w_q, scale)
    else:
        out = (jnp.dot(x2, w_q.astype(x.dtype),
                       preferred_element_type=jnp.float32)
               * scale).astype(x.dtype)
    return out.reshape(lead + (N,))


def _int4_matmul(x, w_p, scale, use_pallas):
    Kh, N = w_p.shape
    G = scale.shape[0] if scale.ndim == 2 else 1
    x2, lead = _flat(x)
    if use_pallas is None:
        use_pallas = (_use_pallas("INT4", x2.shape[0], 2 * Kh, N,
                                  stacked=False)
                      and Kh % 128 == 0 and N % 128 == 0
                      and (G == 1 or ((2 * Kh // G) % 128 == 0
                                      and Kh % (2 * Kh // G) == 0)))
    if use_pallas:
        from block_transformer_tpu.ops import dequant_matmul
        out = dequant_matmul.int4_matmul(x2, w_p, scale)
    else:
        w = quant.dequantize_int4(w_p, scale, x.dtype)
        out = jnp.dot(x2, w, preferred_element_type=x.dtype)
    return out.reshape(lead + (N,))
