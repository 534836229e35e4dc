"""Fused im2col + covariance GEMM for conv K-FAC A-factors (Pallas, TPU).

The A factor of a conv layer is A = scale * X^T X with X = im2col(a) of
shape (B*oh*ow, kh*kw*C). The XLA path (ops/factors.extract_patches +
dot_general) MATERIALIZES X in HBM: for ResNet-50/bs32 that is ~2.7 GB
written and read back per step — roughly half the measured factor-stage
cost (BENCH_NOTES round 2). This kernel streams activation tiles through
VMEM, builds the patch rows on-chip, and accumulates the covariance on the
MXU; X never touches HBM.

This is the fused "patch-extract + tensor-core GEMM" native component the
reference approximates with tcmm's f_gemm_ex
(/root/reference/packages/tcmm/src/tcmm_kernel.cu:125-157) plus a separate
im2col; SURVEY.md §7 lists it as the round-goal native kernel.

Blocking: grid = (column-chunks of A, batch-chunks), batch fastest so each
output column block accumulates over consecutive grid steps. Per step the
kernel loads one (b_chunk, Hp, Wp, C) padded-activation tile, assembles the
full patch row-block X_cat (N, D) in VMEM scratch from kh*kw strided
windows, and issues one (N, D)^T (N, c_chunk) MXU dot into the (D, c_chunk)
output block. Requirements: NHWC f32 input, C a multiple of (or smaller
than) the lane width handled by Mosaic; static shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PadPairs = Tuple[Tuple[int, int], Tuple[int, int]]


def _kernel(a_ref, out_ref, xcat_ref, *, kh, kw, sh, sw, oh, ow, c,
            c_chunk, n_b):
    """One grid step: build X_cat from the activation tile, accumulate one
    column chunk of X^T X."""
    nb = pl.program_id(1)
    bc = a_ref.shape[0]
    n_rows = bc * oh * ow

    # assemble patch rows in VMEM: X_cat[:, (i*kw+j)*c : +c] = window(i, j)
    # (stored in the compute dtype — bf16 on the MXU fast path, halving
    # scratch VMEM; accumulation stays f32 via preferred_element_type,
    # matching the XLA path's default-precision GEMM)
    for i in range(kh):
        for j in range(kw):
            win = a_ref[
                :,
                i : i + (oh - 1) * sh + 1 : sh,
                j : j + (ow - 1) * sw + 1 : sw,
                :,
            ]
            xcat_ref[:, (i * kw + j) * c : (i * kw + j + 1) * c] = (
                win.reshape(n_rows, c).astype(xcat_ref.dtype)
            )

    col = pl.program_id(0)
    if c_chunk == xcat_ref.shape[1]:
        # single-chunk layout (D not 128-divisible): a dynamic slice of
        # width D cannot be proven lane-aligned by Mosaic even at offset
        # 0 — read the whole scratch instead
        rhs = xcat_ref[...]
    else:
        rhs = xcat_ref[:, pl.dslice(col * c_chunk, c_chunk)]
    acc = jax.lax.dot_general(
        xcat_ref[...],
        rhs,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(nb == 0)
    def _():
        out_ref[...] = acc

    @pl.when(nb != 0)
    def _():
        out_ref[...] += acc


def _tri_kernel(a_ref, out_ref, xcat_ref, *, kh, kw, sh, sw, oh, ow, c,
                n_b):
    """Symmetric-aware variant: X^T X is symmetric, so compute only the
    upper block-row strips out[rb*128:, rb*128:] = X_rb^T X[:, rb*128:]
    (~45% fewer MXU flops at D=1152); the caller mirrors the strict lower
    triangle outside the kernel. Requires the whole (Dp, Dp) output block
    VMEM-resident (single column chunk). Pad columns of the scratch
    (D..Dp) are never written — their garbage only reaches output
    rows/cols >= D, which the caller slices off."""
    nb = pl.program_id(0)
    bc = a_ref.shape[0]
    n_rows = bc * oh * ow
    dpad = xcat_ref.shape[1]

    for i in range(kh):
        for j in range(kw):
            win = a_ref[
                :,
                i : i + (oh - 1) * sh + 1 : sh,
                j : j + (ow - 1) * sw + 1 : sw,
                :,
            ]
            xcat_ref[:, (i * kw + j) * c : (i * kw + j + 1) * c] = (
                win.reshape(n_rows, c).astype(xcat_ref.dtype)
            )

    for rb in range(dpad // 128):
        lhs = xcat_ref[:, rb * 128 : (rb + 1) * 128]
        rhs = xcat_ref[:, rb * 128 :]
        acc = jax.lax.dot_general(
            lhs,
            rhs,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(nb == 0)
        def _(rb=rb, acc=acc):
            out_ref[rb * 128 : (rb + 1) * 128, rb * 128 :] = acc

        @pl.when(nb != 0)
        def _(rb=rb, acc=acc):
            out_ref[rb * 128 : (rb + 1) * 128, rb * 128 :] += acc


def _pairs_kernel(a_ref, out_ref, xcat_ref, *, kh, kw, sh, sw, oh, ow, c,
                  pairs):
    """Tap-pair-blocked variant for large D (c >= 256, D*D output far over
    VMEM): assemble X_cat once per batch tile, then compute one (c, c) MXU
    dot per UPPER tap pair (t1 <= t2) in this call's static chunk. The
    (chunk, c, c) output block is constant-indexed, so it stays VMEM-
    resident across the whole batch sweep; the caller mirrors the strict
    lower tap triangle outside (45% flop cut at 3x3). This is the shape of
    kernel the D-resident designs cannot reach: at D=2304/4608 the (D, D)
    block is 21/85 MB, but a (c, c) tap block is 0.25/1 MB.

    Distinct from ops/pallas/tap_cov.py (the recorded negative result):
    that kernel re-read two strided windows from the activation tile per
    pair (90 window reshapes per tile — Mosaic compile blew up at c >= 256);
    here the 9 window reshapes happen once into scratch and every pair dot
    is a lane-aligned static column slice of the scratch."""
    nb = pl.program_id(0)
    bc = a_ref.shape[0]
    n_rows = bc * oh * ow

    for i in range(kh):
        for j in range(kw):
            win = a_ref[
                :,
                i : i + (oh - 1) * sh + 1 : sh,
                j : j + (ow - 1) * sw + 1 : sw,
                :,
            ]
            xcat_ref[:, (i * kw + j) * c : (i * kw + j + 1) * c] = (
                win.reshape(n_rows, c).astype(xcat_ref.dtype)
            )

    for p, (t1, t2) in enumerate(pairs):
        acc = jax.lax.dot_general(
            xcat_ref[:, t1 * c : (t1 + 1) * c],
            xcat_ref[:, t2 * c : (t2 + 1) * c],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(nb == 0)
        def _(p=p, acc=acc):
            out_ref[p] = acc

        @pl.when(nb != 0)
        def _(p=p, acc=acc):
            out_ref[p] += acc


# Leave headroom under the ~16 MB/core scoped-VMEM limit for compiler
# temporaries (measured: an 11 MB nominal budget compiled to a 20.7 MB
# scoped allocation and was rejected — before _pad_bytes modeled the
# Mosaic tile padding that made up most of that gap).
_VMEM_BUDGET = 10 * 1024 * 1024


def _pad_bytes(shape, itemsize):
    """VMEM bytes of one block after Mosaic tile padding: the minor dim
    pads to 128 lanes, the second-minor to the dtype sublane multiple
    (f32 8, bf16 16). This is what the scoped-VMEM accountant charges —
    a (bc, 115, 115, 16) f32 stem-polyphase block is 7.1 MB/buffer, 8x
    its nominal size (measured: the un-padded estimate under-counted a
    19.6 MB kernel as ~7.5 MB and compile failed on the 16 MB limit)."""
    sub = 32 // itemsize
    shape = tuple(shape)
    minor = -(-shape[-1] // 128) * 128
    second = -(-shape[-2] // sub) * sub if len(shape) >= 2 else 1
    lead = 1
    for s in shape[:-2]:
        lead *= s
    return lead * second * minor * itemsize


def _pick_chunks(b, oh, ow, hp, wp, c, d, itemsize):
    """(c_chunk, bc): widest lane-aligned output column chunk + batch chunk
    that fit the VMEM budget together.

    Column chunks are expensive: the activation tile is re-streamed and the
    X_cat scratch reassembled once per chunk (the input/out specs only
    depend on the batch index), so n_cols multiplies the kernel's HBM
    traffic and VPU assembly work. The original fixed c_chunk=128 made the
    c=128 28x28 layer re-read its tile 9x and LOSE to XLA's materialized
    path (bench_ops --op factor_a); sizing the chunk to VMEM gives
    n_cols=1 for D<=1152 and 2-12 above."""
    tile = _pad_bytes((hp, wp, c), 4)  # f32 input tile per batch element
    # candidate widths: full D, else 128-multiples dividing D (Mosaic lane
    # rule: last dim is a multiple of 128 or the full array dim)
    cands = [d] + [w for w in range(d - d % 128, 127, -128) if d % w == 0]
    for c_chunk in sorted(set(cands), reverse=True):
        # a single-column-chunk output block never changes grid index and
        # stays VMEM-resident; multi-chunk outputs are double-buffered by
        # Mosaic (measured: c=256 c_chunk=768 compiled to a 22.9 MB scoped
        # allocation, ~2x the block's nominal 7.1 MB + scratch)
        out_bytes = (_pad_bytes((d, c_chunk), 4)
                     * (1 if c_chunk == d else 2))
        if out_bytes >= _VMEM_BUDGET:
            continue
        best_bc = 0
        for bc in range(1, b + 1):
            if b % bc:
                continue
            # input block counted twice: Mosaic double-buffers grid inputs
            if (_pad_bytes((bc * oh * ow, d), itemsize) + out_bytes
                    + 2 * bc * tile <= _VMEM_BUDGET):
                best_bc = bc
        if best_bc:
            return c_chunk, best_bc
    return None  # no feasible blocking: even bc=1 X_cat overflows VMEM


def _pick_tri(b, oh, ow, hp, wp, c, d, itemsize):
    """bc for the symmetric block-triangular kernel (whole lane-padded
    (Dp, Dp) output resident, X_cat widened to Dp), or None if it cannot
    fit VMEM."""
    dpad = -(-d // 128) * 128
    tile = _pad_bytes((hp, wp, c), 4)
    out_bytes = _pad_bytes((dpad, dpad), 4)
    if out_bytes >= _VMEM_BUDGET:
        return None
    best_bc = 0
    for bc in range(1, b + 1):
        if b % bc:
            continue
        if (_pad_bytes((bc * oh * ow, dpad), itemsize) + out_bytes
                + 2 * bc * tile <= _VMEM_BUDGET):
            best_bc = bc
    return best_bc or None


def _pick_pairs(b, oh, ow, hp, wp, c, d, itemsize):
    """(pair_chunk, bc) for the tap-pair-blocked kernel, or None.

    Budget: f32 input tile double-buffered + X_cat scratch + the resident
    f32 (chunk, c, c) output block (constant index map — single buffer).

    bc is maximized FIRST: the per-pair dot contracts over bc*oh*ow rows,
    and at the late-stage geometries this path serves (7x7/14x14 maps) a
    small bc starves the MXU — measured bc=1 at c=512 gave K=49
    contractions and lost 4x to XLA. The pair chunk then takes the budget
    remainder (fewer pallas calls = less tile re-streaming, secondary)."""
    if c % 128 != 0:
        return None
    tile = _pad_bytes((hp, wp, c), 4)
    out_blk = _pad_bytes((c, c), 4)
    n_taps = d // c
    n_pairs = n_taps * (n_taps + 1) // 2
    best = None
    for bc in range(b, 0, -1):
        if b % bc:
            continue
        used = _pad_bytes((bc * oh * ow, d), itemsize) + 2 * bc * tile
        chunk = min(n_pairs, int((_VMEM_BUDGET - used) // out_blk))
        if chunk < 1:
            continue
        # require a healthy contraction depth unless b itself is tiny
        if bc * oh * ow < 256 and bc < b:
            continue
        cand = (chunk, bc)
        if best is None or bc > best[1]:
            best = cand
        break  # bc loop descends: first feasible is the max
    return best


def _polyphase_plan(h, w, c, kernel_size, strides, padding):
    """Static plan turning a STRIDED patch covariance into a unit-stride one.

    Strided window reads lower to tpu.strided_load, which Mosaic only
    implements for 128-wide base memrefs — so stride-2 convs (RN50's 7x7
    stem above all: 14.6 ms isolated on the XLA path, ~1 ms traffic floor)
    could not use the fused kernels. The polyphase identity fixes this
    outside the kernel: with phases P[p,q] = a_pad[:, p::sh, q::sw, :]
    packed channel-wise into Ppack (B, Hs, Ws, sh*sw*C), the stride-s
    kh x kw im2col row at output (x, y), tap (i, j) = (sh*di+p, sw*dj+q)
    equals the UNIT-stride n_di x n_dj im2col of Ppack at tap (di, dj),
    packed channel (p, q, ci):

        a_pad[sh*x + i, sw*y + j, ci] = Ppack[x + di, y + dj, (p,q,ci)]

    so  A_strided = gather(sel) of the unit-stride Gram of Ppack, where
    sel maps feature (i, j, ci) -> (di*n_dj + dj)*cpk + (p*sw + q)*C + ci.
    Taps with i >= kh or j >= kw and zero-padded pack channels only produce
    Gram rows/cols the gather discards. Returns
    (hp, wp, hs, ws, n_di, n_dj, cpk, oh, ow, sel) — sel a numpy index
    array of length kh*kw*C into the packed Gram's kh'*kw'*cpk features.
    """
    import numpy as np

    kh, kw = kernel_size
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    hp, wp = h + ph0 + ph1, w + pw0 + pw1
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1
    n_di = (kh - 1) // sh + 1
    n_dj = (kw - 1) // sw + 1
    hs = oh + n_di - 1
    ws = ow + n_dj - 1
    # packed channel count padded to the sublane multiple the unit-stride
    # kernels' static column writes require
    cpk = -(-(sh * sw * c) // 8) * 8
    sel = np.empty(kh * kw * c, np.int32)
    t = 0
    for i in range(kh):
        di, p = divmod(i, sh)
        for j in range(kw):
            dj, q = divmod(j, sw)
            base = (di * n_dj + dj) * cpk + (p * sw + q) * c
            sel[t : t + c] = np.arange(base, base + c)
            t += c
    return hp, wp, hs, ws, n_di, n_dj, cpk, oh, ow, sel


def polyphase_supported(a_shape, kernel_size, strides, padding=None) -> bool:
    """Gate for the strided polyphase path: non-unit strides, multi-tap
    PACKED kernel, and a VMEM-feasible unit-stride blocking of the packed
    geometry. Small-c strided stems (RN50/Inception/MobileNet 7x7-s2 /
    3x3-s2, c=3) are the target; large-c strided layers pack to dims where
    the unit-stride kernels lose to XLA anyway (gated by the same
    feasibility checks + the caller's rows/c policy)."""
    b, h, w, c = a_shape
    kh, kw = kernel_size
    if tuple(strides) == (1, 1) or kh * kw == 1:
        return False
    if padding is None:
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    _, _, hs, ws, n_di, n_dj, cpk, oh, ow, _ = _polyphase_plan(
        h, w, c, kernel_size, strides, padding
    )
    if n_di * n_dj == 1:
        return False
    d2 = n_di * n_dj * cpk
    return (_pick_tri(b, oh, ow, hs, ws, cpk, d2, 2) is not None
            or _pick_pairs(b, oh, ow, hs, ws, cpk, d2, 2) is not None
            or _pick_chunks(b, oh, ow, hs, ws, cpk, d2, 2) is not None)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "strides", "padding", "compute_dtype"),
)
def patch_cov_polyphase(
    a: jax.Array,
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
    padding: PadPairs,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Strided patch covariance X^T X via the polyphase transform + the
    unit-stride fused kernel. Same contract as patch_cov (f32 NHWC in,
    (D, D) f32 out, feature order (kh, kw, c)) but for strides > 1.

    The packing itself is a few cheap XLA slices of the padded input
    (~the activation's size, e.g. 6.3 MB for the RN50 stem) — negligible
    against the im2col materialization it avoids (295 MB f32)."""
    kh, kw = kernel_size
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    b, h, w, c = a.shape
    hp, wp, hs, ws, n_di, n_dj, cpk, oh, ow, sel = _polyphase_plan(
        h, w, c, kernel_size, strides, padding
    )
    if ph0 or ph1 or pw0 or pw1:
        a = jnp.pad(a, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    phases = []
    for p in range(sh):
        for q in range(sw):
            ph = a[:, p::sh, q::sw, :]
            pad_r = hs - ph.shape[1]
            pad_c = ws - ph.shape[2]
            if pad_r > 0 or pad_c > 0:
                ph = jnp.pad(
                    ph,
                    ((0, 0), (0, max(pad_r, 0)), (0, max(pad_c, 0)), (0, 0)),
                )
            phases.append(ph[:, :hs, :ws, :])
    packed = jnp.concatenate(phases, axis=-1)
    if cpk > sh * sw * c:
        packed = jnp.pad(
            packed, ((0, 0), (0, 0), (0, 0), (0, cpk - sh * sw * c))
        )
    gram = patch_cov(
        packed, (n_di, n_dj), (1, 1), ((0, 0), (0, 0)), compute_dtype
    )
    sel = jnp.asarray(sel)
    return gram[sel][:, sel]


def supported(a_shape, kernel_size, strides=(1, 1),
              padding=None) -> bool:
    """Geometry gate: lane-friendly channel counts, a multi-tap kernel
    (1x1 convs and tiny-C stems keep the XLA path), unit strides —
    strided window reads lower to tpu.strided_load, which Mosaic only
    implements for 128-wide base memrefs (measured on v5e: stride-2 3x3
    convs fail to compile; RN50 has 3 such layers, left on the XLA path)
    — and a feasible VMEM blocking (huge spatial maps where even a
    single-image X_cat overflows VMEM, e.g. 112x112/c128, stay on XLA)."""
    b, h, w, c = a_shape
    kh, kw = kernel_size
    if kh * kw == 1 or c < 64 or c % 8 != 0:
        return False
    if tuple(strides) != (1, 1):
        return False
    if padding is None:
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    (ph0, ph1), (pw0, pw1) = padding
    hp, wp = h + ph0 + ph1, w + pw0 + pw1
    oh, ow = hp - kh + 1, wp - kw + 1
    d = kh * kw * c
    return (_pick_tri(b, oh, ow, hp, wp, c, d, 2) is not None
            or _pick_pairs(b, oh, ow, hp, wp, c, d, 2) is not None
            or _pick_chunks(b, oh, ow, hp, wp, c, d, 2) is not None)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "strides", "padding", "compute_dtype"),
)
def patch_cov(
    a: jax.Array,
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
    padding: PadPairs,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Raw patch covariance X^T X (no scaling, no bias row/col).

    a: (B, H, W, C) float32 NHWC. Returns (D, D) float32, D = kh*kw*C,
    feature order (kh, kw, c) — identical to
    extract_patches(...).reshape(-1, D) summed as X^T X (at
    ``compute_dtype`` GEMM-input precision; f32 accumulation either way).
    """
    kh, kw = kernel_size
    sh, sw = strides
    (ph0, ph1), (pw0, pw1) = padding
    if ph0 or ph1 or pw0 or pw1:
        a = jnp.pad(a, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    b, hp, wp, c = a.shape
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1
    d = kh * kw * c
    itemsize = jnp.dtype(compute_dtype).itemsize
    tri_bc = _pick_tri(b, oh, ow, hp, wp, c, d, itemsize)
    if tri_bc is not None:
        return _patch_cov_tri(
            a, kh, kw, sh, sw, oh, ow, c, d, tri_bc, compute_dtype
        )
    pair_pick = _pick_pairs(b, oh, ow, hp, wp, c, d, itemsize)
    if pair_pick is not None:
        return _patch_cov_pairs(
            a, kh, kw, sh, sw, oh, ow, c, d, pair_pick, compute_dtype
        )
    chunks = _pick_chunks(b, oh, ow, hp, wp, c, d, itemsize)
    if chunks is None:
        raise ValueError(
            f"patch_cov: no VMEM-feasible blocking for {a.shape} "
            f"k={kernel_size} (gate with supported())"
        )
    c_chunk, bc = chunks
    n_cols = d // c_chunk
    n_b = b // bc
    n_rows = bc * oh * ow

    kernel = functools.partial(
        _kernel, kh=kh, kw=kw, sh=sh, sw=sw, oh=oh, ow=ow, c=c,
        c_chunk=c_chunk, n_b=n_b,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_cols, n_b),
        in_specs=[
            pl.BlockSpec(
                (bc, hp, wp, c), lambda col, nb: (nb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (d, c_chunk), lambda col, nb: (0, col),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_rows, d), jnp.dtype(compute_dtype))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * oh * ow * d * d,
            bytes_accessed=b * hp * wp * c * 4 * n_cols,
            transcendentals=0,
        ),
    )(a)
    return out


def _patch_cov_pairs(a, kh, kw, sh, sw, oh, ow, c, d, pick, compute_dtype):
    """Tap-pair-blocked path for large D: one pallas_call per static chunk
    of upper tap pairs (the tile is re-streamed per chunk — a few x the
    activation size, cheap at these geometries), each with its (chunk, c, c)
    output resident; the (T, T) block grid is assembled and mirrored
    outside (A[t2, t1] = A[t1, t2]^T)."""
    import numpy as np

    chunk, bc = pick
    b, hp, wp, _ = a.shape
    n_b = b // bc
    n_rows = bc * oh * ow
    n_taps = kh * kw
    pairs = [(t1, t2) for t1 in range(n_taps) for t2 in range(t1, n_taps)]

    blocks = []
    for start in range(0, len(pairs), chunk):
        chunk_pairs = pairs[start : start + chunk]
        kernel = functools.partial(
            _pairs_kernel, kh=kh, kw=kw, sh=sh, sw=sw, oh=oh, ow=ow, c=c,
            pairs=chunk_pairs,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_b,),
            in_specs=[
                pl.BlockSpec(
                    (bc, hp, wp, c), lambda nb: (nb, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (len(chunk_pairs), c, c), lambda nb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (len(chunk_pairs), c, c), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((n_rows, d), jnp.dtype(compute_dtype))
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * oh * ow * c * c * len(chunk_pairs),
                bytes_accessed=b * hp * wp * c * 4,
                transcendentals=0,
            ),
        )(a)
        blocks.append(out)
    upper = jnp.concatenate(blocks) if len(blocks) > 1 else blocks[0]

    iu = np.array([p[0] for p in pairs])
    ju = np.array([p[1] for p in pairs])
    grid4 = jnp.zeros((n_taps, n_taps, c, c), jnp.float32)
    grid4 = grid4.at[iu, ju].set(upper)
    strict = grid4.at[np.arange(n_taps), np.arange(n_taps)].set(0.0)
    full = grid4 + jnp.transpose(strict, (1, 0, 3, 2))
    return jnp.transpose(full, (0, 2, 1, 3)).reshape(d, d)


def _patch_cov_tri(a, kh, kw, sh, sw, oh, ow, c, d, bc, compute_dtype):
    """Symmetric block-triangular path: one resident (Dp, Dp) output,
    upper block-row strip GEMMs in-kernel (~45% flop cut from symmetry),
    block mirror + crop outside. Dp = D rounded up to the 128-lane width;
    pad-column garbage only reaches the cropped region."""
    b, hp, wp, _ = a.shape
    dpad = -(-d // 128) * 128
    n_b = b // bc
    n_rows = bc * oh * ow
    kernel = functools.partial(
        _tri_kernel, kh=kh, kw=kw, sh=sh, sw=sw, oh=oh, ow=ow, c=c,
        n_b=n_b,
    )
    # upper-triangle flops: sum_rb 128*(dpad - rb*128) contractions
    nblk = dpad // 128
    tri_cols = 128 * dpad * (nblk + 1) // 2
    out = pl.pallas_call(
        kernel,
        grid=(n_b,),
        in_specs=[
            pl.BlockSpec(
                (bc, hp, wp, c), lambda nb: (nb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (dpad, dpad), lambda nb: (0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((dpad, dpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_rows, dpad), jnp.dtype(compute_dtype))
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * oh * ow * tri_cols,
            bytes_accessed=b * hp * wp * c * 4,
            transcendentals=0,
        ),
    )(a)
    blk = jnp.arange(dpad) // 128
    upper = blk[None, :] >= blk[:, None]
    return jnp.where(upper, out, out.T)[:d, :d]
