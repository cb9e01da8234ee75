"""Fused dual-softmax matching — Pallas TPU kernels.

The coarse matcher's memory peak is the dense (L, S) confidence matrix
(SURVEY.md §5 long-context notes: N x L x S fp32, ~470 MB per 832px pair,
7.4 GB at 1600px). These kernels compute everything match extraction needs
WITHOUT materializing (L, S) in HBM, flash-attention style:

  conf[l, s] = softmax_rows(z)[l, s] * softmax_cols(z)[l, s]
             = exp(2 z[l, s] - lse_r[l] - lse_c[s]),   z = <f0_l, f1_s> / (c T)

  pass 1: 2D-tiled sweep maintaining running logsumexp per row (VMEM scratch,
          reset per L-tile) and per column (full-width scratch vector,
          accumulated across the whole sequential grid);
  pass 2: same sweep reducing row max/argmax of (2z - lse_c) and column
          max/argmax of (2z - lse_r).

From those O(L + S) outputs, mutual-NN + top-K extraction is cheap XLA
(a mutual cell is its row argmax, with value exp(row_max_adj - lse_r)), so
the whole matching stage reads the features twice and writes O(L + S) —
vs O(L*S) several times over for the dense path. Compute per pass is one
(tile_l, C) x (C, tile_s) MXU matmul per grid cell; VMEM per cell is
~0.5 MB, so the kernel scales to 1600-px (40k-token) maps where the dense
conf matrix cannot even be allocated.

Masks enter as 0/1 vectors adding -1e9 to masked logits, exactly like the
dense ops/dual_softmax.py path, so results are numerically comparable.
Padded rows carry mask 0 and cannot win any reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _fast_exp(x):
    """Schraudolph bit-trick exp: ~3 VPU ops vs ~20 for accurate exp.

    exp(x) ≈ bitcast_f32(int32(A·x + B)) with A = 2^23/ln2 and B the f32
    exponent bias shifted into place, minus a correction that centers the
    relative error (max ~±3%, mean ~1.5%). The DSM exp streams are
    VPU-bound (PERFORMANCE.md: ~30 µs exp vs ~3 µs MXU per 512x2048 tile),
    so the shorter op sequence is a direct wall-clock win; the ±3% on the
    logsumexp only shifts confidences a few percent, far from the match
    threshold margins (gated by MatcherConfig.dsm_fast_exp, diag-checked).
    Inputs are clamped to the f32 exp range so masked -1e9 logits map to 0
    instead of wrapping the int32 bias arithmetic.
    """
    x = jnp.clip(x, -87.0, 87.0)
    # NOTE on rounding (ADVICE r4): the biased sum is ~1.06e9 where the f32
    # ulp is 64, so the int32 cast's floor-vs-round distinction (and any
    # +0.5) is absorbed by f32 quantization before the cast — the ±3%
    # relative-error bound of the approximation already includes this ±32
    # integer-bias jitter. True round-to-nearest would need f64, which the
    # TPU VPU does not have; not worth emulating for an opt-in fast path.
    i = (x * 12102203.0 + 1064866805.0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _exp_fn(fast: bool):
    return _fast_exp if fast else jnp.exp


def _sim_tile(f0h, f0l, f1h, f1l, m0, m1):
    """hi/lo bf16 tiles -> masked (TL, TS) f32 logits on the MXU.

    Accurate logits are load-bearing: Mosaic's default truncates f32
    operands to ONE bf16 pass on the MXU, and the 1/temperature=10 logit
    scale turns that ~0.4% feature quantization into O(0.7) logit error —
    measured on real features: 49% row-argmax agreement with the dense
    path, 45% fewer extracted matches, 2x the epipolar error (round 4,
    scene_1001). The fix is a 3-pass bf16 compensated product on
    PRE-decomposed hi/lo tiles (f = hi + lo, both bf16, split once in XLA
    outside the kernel): z = hi@hi + hi@lo + lo@hi, max logit error
    ~2e-5 (vs 5e-7 for precision=HIGHEST and 7e-3 for one pass at unit
    scale). Same bytes in VMEM as one f32 copy, half the MXU passes of
    HIGHEST, and no per-tile VPU decomposition (a HIGHEST variant
    measured 638 us/tile standalone; in-kernel decomposition 739 us)."""

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    z = dot(f0h, f1h) + dot(f0h, f1l) + dot(f0l, f1h)
    z = z + (m0[0, :][:, None] - 1.0) * -NEG
    z = z + (m1[0, :][None, :] - 1.0) * -NEG
    return z


def _pass1_kernel(
    f0h_ref, f0l_ref, f1h_ref, f1l_ref, m0_ref, m1_ref,
    lse_r_ref, lse_c_ref,
    row_m_ref, row_s_ref, col_m_ref, col_s_ref,
    *, fast_exp=False,
):
    """Running row lse (reset per L-tile) + running col lse (whole sweep)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)
    ts = f1h_ref.shape[0]

    @pl.when((i == 0) & (j == 0))
    def _init_cols():
        col_m_ref[:] = jnp.full_like(col_m_ref, NEG)
        col_s_ref[:] = jnp.zeros_like(col_s_ref)

    @pl.when(j == 0)
    def _init_rows():
        row_m_ref[:] = jnp.full_like(row_m_ref, NEG)
        row_s_ref[:] = jnp.zeros_like(row_s_ref)

    z = _sim_tile(f0h_ref[:], f0l_ref[:], f1h_ref[:], f1l_ref[:],
                  m0_ref, m1_ref)

    # Two (TL, TS) exps per tile, one per softmax direction, each shifted by
    # its own running max. The shifts CANNOT be shared: post-transformer
    # logit spreads exceed fp32's ~87-decade exp range, so a rank-1 rescale
    # from a common tile shift (tried: sum_l e·exp(m_loc-t)·exp(t-cm))
    # silently flushes whole columns to zero. Independent row/col shifts are
    # exactly what keeps the dense path exact at any spread.
    exp = _exp_fn(fast_exp)  # only the (TL, TS) streams; corrections exact
    m_old = row_m_ref[0, :]
    m_new = jnp.maximum(m_old, jnp.max(z, axis=1))
    row_s_ref[0, :] = row_s_ref[0, :] * jnp.exp(m_old - m_new) + jnp.sum(
        exp(z - m_new[:, None]), axis=1
    )
    row_m_ref[0, :] = m_new

    # Column running logsumexp (slice j of the full-width scratch)
    sl = pl.ds(j * ts, ts)
    cm_old = col_m_ref[0, sl]
    cm_new = jnp.maximum(cm_old, jnp.max(z, axis=0))
    col_s_ref[0, sl] = col_s_ref[0, sl] * jnp.exp(cm_old - cm_new) + jnp.sum(
        exp(z - cm_new[None, :]), axis=0
    )
    col_m_ref[0, sl] = cm_new

    @pl.when(j == n_j - 1)
    def _flush_rows():
        lse_r_ref[0, :] = row_m_ref[0, :] + jnp.log(
            jnp.maximum(row_s_ref[0, :], 1e-30)
        )

    @pl.when((i == n_i - 1) & (j == n_j - 1))
    def _flush_cols():
        lse_c_ref[0, :] = col_m_ref[0, :] + jnp.log(
            jnp.maximum(col_s_ref[0, :], 1e-30)
        )


def _pass2_kernel(
    f0h_ref, f0l_ref, f1h_ref, f1l_ref, m0_ref, m1_ref,
    lse_r_ref, lse_c_ref,
    row_max_ref, row_arg_ref, col_max_out_ref, col_arg_out_ref,
    rm_ref, ra_ref, cm_ref, ca_ref,
):
    """Row max/arg of (2z - lse_c); col max/arg of (2z - lse_r)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)
    tl = f0h_ref.shape[0]
    ts = f1h_ref.shape[0]

    @pl.when((i == 0) & (j == 0))
    def _init_cols():
        cm_ref[:] = jnp.full_like(cm_ref, NEG)
        ca_ref[:] = jnp.zeros_like(ca_ref)

    @pl.when(j == 0)
    def _init_rows():
        rm_ref[:] = jnp.full_like(rm_ref, NEG)
        ra_ref[:] = jnp.zeros_like(ra_ref)

    z2 = 2.0 * _sim_tile(f0h_ref[:], f0l_ref[:], f1h_ref[:], f1l_ref[:],
                         m0_ref, m1_ref)

    a_row = z2 - lse_c_ref[0, pl.ds(j * ts, ts)][None, :]  # (TL, TS)
    t_rmax = jnp.max(a_row, axis=1)
    t_rarg = jnp.argmax(a_row, axis=1).astype(jnp.int32) + j * ts
    better_r = t_rmax > rm_ref[0, :]
    rm_ref[0, :] = jnp.where(better_r, t_rmax, rm_ref[0, :])
    ra_ref[0, :] = jnp.where(better_r, t_rarg, ra_ref[0, :])

    a_col = z2 - lse_r_ref[0, :][:, None]
    t_cmax = jnp.max(a_col, axis=0)
    t_carg = jnp.argmax(a_col, axis=0).astype(jnp.int32) + i * tl
    sl = pl.ds(j * ts, ts)
    better_c = t_cmax > cm_ref[0, sl]
    cm_ref[0, sl] = jnp.where(better_c, t_cmax, cm_ref[0, sl])
    ca_ref[0, sl] = jnp.where(better_c, t_carg, ca_ref[0, sl])

    @pl.when(j == n_j - 1)
    def _flush_rows():
        row_max_ref[0, :] = rm_ref[0, :]
        row_arg_ref[0, :] = ra_ref[0, :]

    @pl.when((i == n_i - 1) & (j == n_j - 1))
    def _flush_cols():
        col_max_out_ref[0, :] = cm_ref[0, :]
        col_arg_out_ref[0, :] = ca_ref[0, :]


def _pad_to(a, n, axis, value):
    pad = n - a.shape[axis]
    if pad <= 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("temperature", "tile_l", "tile_s", "interpret",
                              "fast_exp")
)
def dual_softmax_stats(
    feat0: jax.Array,   # (L, C) — one pair (vmap over batch outside)
    feat1: jax.Array,   # (S, C)
    mask0: jax.Array,   # (L,) bool
    mask1: jax.Array,   # (S,) bool
    temperature: float = 0.1,
    tile_l: int = 512,
    tile_s: int = 2048,
    interpret: bool = False,
    fast_exp: bool = False,
):
    """Returns (lse_r (L,), lse_c (S,), row_max_adj (L,), row_arg (L,),
    col_max_adj (S,), col_arg (S,)), float32/int32.

    conf row max = exp(row_max_adj - lse_r); col_arg = conf column argmax.
    """
    l, c = feat0.shape
    s = feat1.shape[0]
    lp = ((l + tile_l - 1) // tile_l) * tile_l
    sp = ((s + tile_s - 1) // tile_s) * tile_s
    # (Measured: a base-2 variant — log2(e) folded into this scale with
    # exp2/log2 kernels — was NOT faster on v5e (45.0 vs 44.7 ms at
    # 1024x2048 tiles, 1600 px); Mosaic's native exp is already optimal.
    # Natural exp stays.)
    scale = 1.0 / (c * temperature)
    # Compensated hi/lo bf16 decomposition, done ONCE in XLA outside the
    # kernels (see _sim_tile for the accuracy rationale — one bf16 pass
    # was measured catastrophic on real features). hi+lo bf16 tiles cost
    # the same VMEM bytes as one f32 copy and need no per-tile VPU work.
    def _hi_lo(f, n, axis):
        f = _pad_to(f, n, axis, 0)
        hi = f.astype(jnp.bfloat16)
        lo = (f - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    f0h, f0l = _hi_lo(feat0.astype(jnp.float32) * scale, lp, 0)
    f1h, f1l = _hi_lo(feat1.astype(jnp.float32), sp, 0)
    m0 = _pad_to(mask0.astype(jnp.float32)[None, :], lp, 1, 0.0)
    m1 = _pad_to(mask1.astype(jnp.float32)[None, :], sp, 1, 0.0)
    n_i, n_j = lp // tile_l, sp // tile_s

    spec_f0 = pl.BlockSpec((tile_l, c), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    # Block index (j, 0): row-block j of the (sp, c) feature array. The
    # round-4 bug here — (0, j) — offset the CHANNEL axis by j*c instead,
    # which is out of range for j >= 1 and clamps back to block 0: every
    # S-tile after the first silently re-read f1's first tile. Row lse
    # double-counted tile-0 mass (error exactly log 2 with n_j = 2 on
    # match-dominated rows) and all column stats for j >= 1 were computed
    # from the wrong features — 45% of matches lost at 512 px, worse at
    # 832+. The interpret-mode parity test used 300x200 features (a single
    # tile), so it never exercised n_j > 1; test_pallas_dsm.py now sweeps
    # multi-tile shapes.
    spec_f1 = pl.BlockSpec((tile_s, c), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    spec_m0 = pl.BlockSpec((1, tile_l), lambda i, j: (0, i),
                           memory_space=pltpu.VMEM)
    spec_m1 = pl.BlockSpec((1, tile_s), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    spec_vl = pl.BlockSpec((1, tile_l), lambda i, j: (0, i),
                           memory_space=pltpu.VMEM)
    spec_vs_full = pl.BlockSpec((1, sp), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)

    lse_r, lse_c = pl.pallas_call(
        functools.partial(_pass1_kernel, fast_exp=fast_exp),
        grid=(n_i, n_j),
        in_specs=[spec_f0, spec_f0, spec_f1, spec_f1, spec_m0, spec_m1],
        out_specs=[spec_vl, spec_vs_full],
        out_shape=[
            jax.ShapeDtypeStruct((1, lp), jnp.float32),
            jax.ShapeDtypeStruct((1, sp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_l), jnp.float32),
            pltpu.VMEM((1, tile_l), jnp.float32),
            pltpu.VMEM((1, sp), jnp.float32),
            pltpu.VMEM((1, sp), jnp.float32),
        ],
        interpret=interpret,
    )(f0h, f0l, f1h, f1l, m0, m1)

    row_max, row_arg, col_max, col_arg = pl.pallas_call(
        _pass2_kernel,
        grid=(n_i, n_j),
        in_specs=[spec_f0, spec_f0, spec_f1, spec_f1, spec_m0, spec_m1,
                  spec_vl, spec_vs_full],
        out_specs=[spec_vl, spec_vl, spec_vs_full, spec_vs_full],
        out_shape=[
            jax.ShapeDtypeStruct((1, lp), jnp.float32),
            jax.ShapeDtypeStruct((1, lp), jnp.int32),
            jax.ShapeDtypeStruct((1, sp), jnp.float32),
            jax.ShapeDtypeStruct((1, sp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_l), jnp.float32),
            pltpu.VMEM((1, tile_l), jnp.int32),
            pltpu.VMEM((1, sp), jnp.float32),
            pltpu.VMEM((1, sp), jnp.int32),
        ],
        interpret=interpret,
    )(f0h, f0l, f1h, f1l, m0, m1, lse_r, lse_c)
    return (
        lse_r[0, :l], lse_c[0, :s], row_max[0, :l],
        row_arg[0, :l], col_max[0, :s], col_arg[0, :s],
    )


def fused_extract_matches(
    feat0: jax.Array,     # (B, L, C)
    feat1: jax.Array,     # (B, S, C)
    mask0: jax.Array,     # (B, L) bool
    mask1: jax.Array,     # (B, S) bool
    threshold: float,
    k: int,
    temperature: float = 0.1,
    tile_l: int = 512,
    tile_s: int = 2048,
    interpret: bool = False,
    fast_exp: bool = False,
):
    """Fused replacement for dual_softmax_confidence + extract_topk_matches.

    tile_l/tile_s are plumbed through to dual_softmax_stats so chips with a
    smaller VMEM budget can override the defaults (tuned on v5e)."""
    from .dual_softmax import CoarseMatches

    stats = jax.vmap(
        lambda a, b, ma, mb: dual_softmax_stats(
            a, b, ma, mb, temperature=temperature,
            tile_l=tile_l, tile_s=tile_s, interpret=interpret,
            fast_exp=fast_exp,
        )
    )(feat0, feat1, mask0, mask1)
    lse_r, _lse_c, row_max_adj, row_arg, _col_max_adj, col_arg = stats
    b, l = row_max_adj.shape

    conf_row = jnp.exp(row_max_adj - lse_r)           # (B, L) row max conf
    keep = mask0 & (conf_row > threshold)
    back = jnp.take_along_axis(col_arg, row_arg, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
    keep = keep & (back == rows)
    scores = jnp.where(keep, conf_row, 0.0)
    kk = min(k, l)  # tiny grids can hold fewer rows than the K capacity
    top_conf, idx0 = jax.lax.top_k(scores, kk)
    if kk < k:
        top_conf = jnp.pad(top_conf, ((0, 0), (0, k - kk)))
        idx0 = jnp.pad(idx0, ((0, 0), (0, k - kk)))
    idx0 = idx0.astype(jnp.int32)
    idx1 = jnp.take_along_axis(row_arg, idx0, axis=1)
    valid = top_conf > threshold
    return CoarseMatches(idx0, idx1, top_conf, valid)
