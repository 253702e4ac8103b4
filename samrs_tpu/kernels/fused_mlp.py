"""Fused transformer MLP: gelu(x @ W1 + b1) @ W2 + b2 in one Pallas kernel.

Why: with plain XLA the exact-erf gelu is FUSED INTO the lin2 matmul and
recomputed for every output column tile (C/128 times — 10x for ViT-H), which
pins the MLP matmuls at ~35% MXU (the erf chain stalls the VPU between MXU
passes).  Splitting the fusion with an optimization_barrier materialises the
(T, 4C) hidden to HBM instead (~400 MB of traffic per ViT-H block at B=4).
This kernel does neither: the hidden activations live only in VMEM, gelu is
evaluated exactly once per element, and both matmuls stream through the MXU.

Schedule: grid (T/bt, M/bk), k innermost.  Per step: h = x_tile @ W1[:, k]
(fp32 accumulate), gelu(h) once, partial = gelu @ W2[k, :] accumulated into a
fp32 VMEM scratch; the output tile is stored once on the last k step.  x and
the output tile stay resident across the k loop (their block index does not
change), so HBM traffic is x once, W1/W2 once per token tile, out once.

Backward falls back to the XLA composition via custom_vjp (recomputing the
hidden — a remat that is free here because the forward never stored it).

Reference MLP being accelerated: GD/segment_anything/modeling/common.py:13-28
(MLPBlock), used by every encoder block (image_encoder.py:173-177).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mlp_xla(x, w1, b1, w2, b2, dtype):
    """Oracle — exactly the nn.Dense(lin1) -> erf-gelu -> nn.Dense(lin2)
    composition (params promoted to the compute dtype, like flax Dense)."""
    h = x.astype(dtype) @ w1.astype(dtype) + b1.astype(dtype)
    g = jax.nn.gelu(h, approximate=False)
    return g @ w2.astype(dtype) + b2.astype(dtype)


def _erf(y):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7 — fp32-grade).

    Mosaic has no erf/erfc lowering (only erf_inv), so the exact-gelu
    erfc(-x/sqrt2) the oracle uses cannot be emitted in-kernel; this rational
    approximation over exp (which Mosaic does support) is ~1000x below bf16
    output rounding."""
    s = jnp.sign(y)
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(y))
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-y * y))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)
    h = jax.lax.dot_general(
        x_ref[...], w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[...].astype(jnp.float32)  # (1, bk) broadcasts over rows
    g = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))  # erf-gelu, fp32, once
    part = jax.lax.dot_general(
        g.astype(x_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(k > 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(k == nk - 1)
    def _store():
        o_ref[...] = (acc_ref[...] + b2_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _pick_block_t(T: int) -> int:
    """Largest multiple-of-8 divisor of T in [128, 512]; 0 if none (pad)."""
    for bt in range(512, 127, -8):
        if T % bt == 0:
            return bt
    return 0


def _fused_pallas(x, w1, b1, w2, b2, dtype, block_k, interpret):
    T, C = x.shape
    M = w1.shape[1]
    bt = _pick_block_t(T)
    pad = 0
    if bt == 0:
        bt = 256
        pad = (-T) % bt
        x = jnp.pad(x, ((0, pad), (0, 0)))
    bk = block_k if M % block_k == 0 else M
    nk = M // bk
    xc = x.astype(dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=((T + pad) // bt, nk),
        in_specs=[
            pl.BlockSpec((bt, C), lambda t, k: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bk), lambda t, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda t, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, C), lambda t, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, C), lambda t, k: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T + pad, C), dtype),
        scratch_shapes=[pltpu.VMEM((bt, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * T * C * M,
            bytes_accessed=2 * T * C * 2 + ((T + pad) // bt) * 2 * C * M * 2,
            transcendentals=T * M,
        ),
        interpret=interpret,
    )(xc, w1.astype(dtype), b1.reshape(1, M).astype(dtype),
      w2.astype(dtype), b2.reshape(1, C).astype(dtype))
    return out[:T] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused(x, w1, b1, w2, b2, dtype, use_pallas, block_k, interpret):
    if use_pallas:
        return _fused_pallas(x, w1, b1, w2, b2, dtype, block_k, interpret)
    return mlp_xla(x, w1, b1, w2, b2, dtype)


def _fwd(x, w1, b1, w2, b2, dtype, use_pallas, block_k, interpret):
    out = _fused(x, w1, b1, w2, b2, dtype, use_pallas, block_k, interpret)
    return out, (x, w1, b1, w2, b2)


def _bwd(dtype, use_pallas, block_k, interpret, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: mlp_xla(*a, dtype), x, w1, b1, w2, b2)
    return vjp(g.astype(dtype))


_fused.defvjp(_fwd, _bwd)


def fused_mlp(
    x: jnp.ndarray,  # (..., C) tokens, any leading shape
    w1: jnp.ndarray,  # (C, M)
    b1: jnp.ndarray,  # (M,)
    w2: jnp.ndarray,  # (M, C)
    b2: jnp.ndarray,  # (C,)
    dtype=jnp.bfloat16,
    force_xla: bool = False,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns gelu(x@w1+b1)@w2+b2 with shape x.shape, dtype `dtype`."""
    lead = x.shape[:-1]
    C = x.shape[-1]
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    out = _fused(x.reshape(-1, C), w1, b1, w2, b2, dtype, use_pallas, block_k,
                 interpret)
    return out.reshape(*lead, C)


# ---------------------------------------------------------------------------
# Whole-MLP-sublayer kernel: out = x + MLP(LayerNorm(x))
#
# The transformer block's MLP sublayer spends two extra HBM round-trips per
# layer outside the matmuls: the LayerNorm (read x, write normed) and the
# residual add (read x and the MLP output, write the sum) — ~210 MB/layer at
# ViT-H B=4.  This kernel folds both into the MLP grid: the fp32 LN runs once
# per token tile (k == 0) into a VMEM scratch that the k loop consumes, and
# the residual lands in the k == nk-1 store while the x tile is still
# resident (its block index never changes across k).
# ---------------------------------------------------------------------------


def ln_mlp_residual_xla(x, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps=1e-6):
    """Oracle: x + MLP(LN_fp32(x).astype(dtype)) — exactly the flax
    LayerNorm(dtype-cast) -> Dense -> erf-gelu -> Dense -> residual chain."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * g_ln.astype(jnp.float32) + bt_ln.astype(jnp.float32)
    return x + mlp_xla(xn.astype(dtype), w1, b1, w2, b2, dtype).astype(x.dtype)


def _ln_kernel(x_ref, g_ref, bln_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               acc_ref, xn_ref, *, nk, eps):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _norm():
        xf = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * g_ref[...].astype(jnp.float32) + bln_ref[...].astype(jnp.float32)
        xn_ref[...] = xn.astype(xn_ref.dtype)

    h = jax.lax.dot_general(
        xn_ref[...], w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[...].astype(jnp.float32)
    g = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    part = jax.lax.dot_general(
        g.astype(xn_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(k > 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(k == nk - 1)
    def _store():
        y = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        # residual: x tile is still resident; the add matches the outside
        # bf16 `x + y` up to the (better) fp32 accumulation order
        o_ref[...] = (x_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def _ln_fused_pallas(x, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps, block_k,
                     interpret):
    T, C = x.shape
    M = w1.shape[1]
    bt = _pick_block_t(T)
    pad = 0
    if bt == 0:
        bt = 256
        pad = (-T) % bt
        x = jnp.pad(x, ((0, pad), (0, 0)))
    bk = block_k if M % block_k == 0 else M
    nk = M // bk
    out = pl.pallas_call(
        functools.partial(_ln_kernel, nk=nk, eps=eps),
        grid=((T + pad) // bt, nk),
        in_specs=[
            pl.BlockSpec((bt, C), lambda t, k: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, bk), lambda t, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda t, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, C), lambda t, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda t, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, C), lambda t, k: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T + pad, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, C), jnp.float32),
            pltpu.VMEM((bt, C), jnp.dtype(dtype)),
        ],
        compiler_params=pltpu.CompilerParams(
            # ViT-H sits ~0.7 MB over the 16 MB default once neighbouring
            # kernels change the surrounding buffer assignment (measured with
            # the block2 window layer in the same program); the real working
            # set is the blocks + two (bt, C) scratches.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * C * M,
            bytes_accessed=2 * T * C * 2 + ((T + pad) // bt) * 2 * C * M * 2,
            transcendentals=T * M,
        ),
        interpret=interpret,
    )(x, g_ln.reshape(1, C), bt_ln.reshape(1, C),
      w1.astype(dtype), b1.reshape(1, M).astype(dtype),
      w2.astype(dtype), b2.reshape(1, C).astype(dtype))
    return out[:T] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _ln_fused(x, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps, use_pallas, block_k,
              interpret):
    if use_pallas:
        return _ln_fused_pallas(x, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps,
                                block_k, interpret)
    return ln_mlp_residual_xla(x, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps)


def _ln_fwd(x, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps, use_pallas, block_k,
            interpret):
    out = _ln_fused(x, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps, use_pallas,
                    block_k, interpret)
    return out, (x, g_ln, bt_ln, w1, b1, w2, b2)


def _ln_bwd(dtype, eps, use_pallas, block_k, interpret, res, g):
    x, g_ln, bt_ln, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: ln_mlp_residual_xla(*a, dtype, eps),
        x, g_ln, bt_ln, w1, b1, w2, b2,
    )
    return vjp(g.astype(x.dtype))


_ln_fused.defvjp(_ln_fwd, _ln_bwd)


# ---------------------------------------------------------------------------
# Sublayer TAIL kernel: out = x + MLP(LN(x)) where x = shortcut + crop(att).
#
# The windowed attention kernels emit a PADDED (B, Hp, Wp, C) map (a free
# 6-D-view bitcast of their block grid).  Getting from there to the MLP
# sublayer kernel's input costs two XLA ops that cannot fuse into either
# Pallas call: the crop slice (127 us/layer, odd {3,0,2,1} layout) and the
# residual copy_add (67 us/layer) — ~5.4 ms/iter at ViT-H B=4 (r4 trace,
# enc_hlo slice.448/copy_add_fusion.27).  This kernel reads the padded map
# directly with (1, rh, W, C) blocks (rows/cols beyond H/W are never read),
# adds the shortcut in-kernel, and then runs the LN+MLP+residual k-loop.
# ---------------------------------------------------------------------------


def tail_ln_mlp_residual_xla(att_p, sc, g_ln, bt_ln, w1, b1, w2, b2, dtype,
                             eps=1e-6):
    """Oracle: x = sc + att_p[:, :H, :W]; x + MLP(LN_fp32(x)) — exactly the
    Block's crop -> residual add -> fused_ln_mlp_residual composition."""
    B, H, W, C = sc.shape
    x = sc + att_p[:, :H, :W]
    return ln_mlp_residual_xla(
        x.reshape(-1, C), g_ln, bt_ln, w1, b1, w2, b2, dtype, eps
    ).reshape(B, H, W, C)


def _tail_kernel(att_ref, sc_ref, g_ref, bln_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, o_ref, acc_ref, xn_ref, xs_ref, *, nk, eps):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _prep():
        rh, W, C = sc_ref.shape[1:]
        att = att_ref[0].reshape(rh * W, C)   # sublane-collapse view
        sc = sc_ref[0].reshape(rh * W, C)
        xb = sc + att                          # stream-dtype residual add
        xs_ref[...] = xb
        xf = xb.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * g_ref[...].astype(jnp.float32) + bln_ref[...].astype(jnp.float32)
        xn_ref[...] = xn.astype(xn_ref.dtype)

    h = jax.lax.dot_general(
        xn_ref[...], w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[...].astype(jnp.float32)
    g = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    part = jax.lax.dot_general(
        g.astype(xn_ref.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(k > 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(k == nk - 1)
    def _store():
        rh, W, C = sc_ref.shape[1:]
        y = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        out = (xs_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)
        o_ref[0] = out.reshape(rh, W, C)


def _tail_rows(H: int, W: int) -> int:
    """Largest rh dividing H with rh*W in [128, 512] (rh is an outer block
    dim, so no 8-alignment needed); 0 if none -> XLA composition."""
    best = 0
    for rh in range(1, H + 1):
        if H % rh:
            continue
        if rh * W < 128 or rh * W > 512:
            continue
        best = rh
    return best


def _tail_pallas(att_p, sc, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps, block_k,
                 interpret):
    B, H, W, C = sc.shape
    M = w1.shape[1]
    rh = _tail_rows(H, W)
    bk = block_k if M % block_k == 0 else M
    nk = M // bk
    kernel = functools.partial(_tail_kernel, nk=nk, eps=eps)
    blk = lambda a: pl.BlockSpec((1, rh, W, C), lambda b, r, k: (b, r, 0, 0),
                                 memory_space=pltpu.VMEM)
    cst = lambda *s: pl.BlockSpec(s, lambda b, r, k: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    wspec = lambda s0, s1, kk: pl.BlockSpec(
        (s0, s1), (lambda b, r, k: (0, k)) if kk else (lambda b, r, k: (k, 0)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, H // rh, nk),
        in_specs=[
            blk(att_p), blk(sc),
            cst(1, C), cst(1, C),
            wspec(C, bk, True),   # w1 (C, bk) at column k
            wspec(1, bk, True),   # b1
            wspec(bk, C, False),  # w2 (bk, C) at row k
            cst(1, C),            # b2
        ],
        out_specs=pl.BlockSpec((1, rh, W, C), lambda b, r, k: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), sc.dtype),
        scratch_shapes=[
            pltpu.VMEM((rh * W, C), jnp.float32),
            pltpu.VMEM((rh * W, C), jnp.dtype(dtype)),
            pltpu.VMEM((rh * W, C), sc.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * W * C * M,
            bytes_accessed=3 * B * H * W * C * 2
            + B * (H // rh) * 2 * C * M * 2,
            transcendentals=B * H * W * M,
        ),
        interpret=interpret,
    )(att_p, sc, g_ln.reshape(1, C), bt_ln.reshape(1, C),
      w1.astype(dtype), b1.reshape(1, M).astype(dtype),
      w2.astype(dtype), b2.reshape(1, C).astype(dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _tail_fused(att_p, sc, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps,
                use_pallas, block_k, interpret):
    if use_pallas:
        return _tail_pallas(att_p, sc, g_ln, bt_ln, w1, b1, w2, b2, dtype,
                            eps, block_k, interpret)
    return tail_ln_mlp_residual_xla(att_p, sc, g_ln, bt_ln, w1, b1, w2, b2,
                                    dtype, eps)


def _tail_fwd(att_p, sc, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps, use_pallas,
              block_k, interpret):
    out = _tail_fused(att_p, sc, g_ln, bt_ln, w1, b1, w2, b2, dtype, eps,
                      use_pallas, block_k, interpret)
    return out, (att_p, sc, g_ln, bt_ln, w1, b1, w2, b2)


def _tail_bwd(dtype, eps, use_pallas, block_k, interpret, res, g):
    att_p, sc, g_ln, bt_ln, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: tail_ln_mlp_residual_xla(*a, dtype, eps),
        att_p, sc, g_ln, bt_ln, w1, b1, w2, b2,
    )
    return vjp(g.astype(sc.dtype))


_tail_fused.defvjp(_tail_fwd, _tail_bwd)


def fused_tail_ln_mlp_residual(
    att_p: jnp.ndarray,  # (B, Hp, Wp, C) PADDED attention output (pads unread)
    sc: jnp.ndarray,     # (B, H, W, C) residual stream (the Block shortcut)
    g_ln: jnp.ndarray,
    bt_ln: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    dtype=jnp.bfloat16,
    eps: float = 1e-6,
    force_xla: bool = False,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns x + gelu(LN(x)@w1+b1)@w2+b2 with x = sc + att_p[:, :H, :W]."""
    B, H, W, C = sc.shape
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    if use_pallas and (_tail_rows(H, W) == 0 or W % 8 != 0):
        use_pallas = False  # geometry the kernel can't tile; XLA composition
    return _tail_fused(att_p, sc, g_ln, bt_ln, w1, b1, w2, b2,
                       jnp.dtype(dtype), eps, use_pallas, block_k, interpret)


def fused_ln_mlp_residual(
    x: jnp.ndarray,     # (..., C) tokens, any leading shape
    g_ln: jnp.ndarray,  # (C,) LayerNorm scale
    bt_ln: jnp.ndarray, # (C,) LayerNorm bias
    w1: jnp.ndarray,    # (C, M)
    b1: jnp.ndarray,    # (M,)
    w2: jnp.ndarray,    # (M, C)
    b2: jnp.ndarray,    # (C,)
    dtype=jnp.bfloat16,
    eps: float = 1e-6,
    force_xla: bool = False,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns x + gelu(LN(x)@w1+b1)@w2+b2, shape and dtype of x."""
    lead = x.shape[:-1]
    C = x.shape[-1]
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    out = _ln_fused(x.reshape(-1, C), g_ln, bt_ln, w1, b1, w2, b2,
                    jnp.dtype(dtype), eps, use_pallas, block_k, interpret)
    return out.reshape(*lead, C)
