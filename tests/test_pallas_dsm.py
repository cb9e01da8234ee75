"""Fused Pallas dual-softmax kernel vs the dense reference path.

Runs in interpreter mode on CPU; the real-TPU path is exercised by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from detectorfreesfm_tpu.ops.dual_softmax import (
    dual_softmax_confidence,
    extract_topk_matches,
)
from detectorfreesfm_tpu.ops.pallas_dsm import (
    dual_softmax_stats,
    fused_extract_matches,
)


def _features(b=2, l=300, s=200, c=64, seed=0):
    rng = np.random.default_rng(seed)
    f0 = rng.normal(0, 1, (b, l, c)).astype(np.float32)
    f1 = rng.normal(0, 1, (b, s, c)).astype(np.float32)
    # Plant some strong mutual matches
    for bb in range(b):
        for m in range(40):
            f1[bb, m] = f0[bb, m] + rng.normal(0, 0.05, c)
    m0 = np.ones((b, l), bool)
    m1 = np.ones((b, s), bool)
    m0[:, -17:] = False  # ragged padding
    m1[:, -9:] = False
    return (jnp.asarray(f0) * 3, jnp.asarray(f1) * 3,
            jnp.asarray(m0), jnp.asarray(m1))


def test_stats_match_dense_softmaxes():
    f0, f1, m0, m1 = _features()
    conf = dual_softmax_confidence(f0, f1, m0, m1)
    lse_r, lse_c, row_max_adj, row_arg, col_max_adj, col_arg = jax.vmap(
        lambda a, b_, ma, mb: dual_softmax_stats(a, b_, ma, mb, interpret=True)
    )(f0, f1, m0, m1)
    conf_np = np.asarray(conf)
    # conf row max / argmax parity (live rows only)
    row_max_conf = np.exp(np.asarray(row_max_adj) - np.asarray(lse_r))
    ref_row_max = conf_np.max(axis=2)
    ref_row_arg = conf_np.argmax(axis=2)
    live = np.asarray(m0)
    # Values: kernel logits are bf16 (z ~ 100 -> conf rel err up to ~10%);
    # ranks must agree, values must be close
    np.testing.assert_allclose(
        row_max_conf[live], ref_row_max[live], rtol=0.15, atol=0.03
    )
    # bf16 feature quantization can flip near-ties; demand 99% agreement
    agree = (np.asarray(row_arg) == ref_row_arg)[live].mean()
    assert agree > 0.99, agree
    ref_col_arg = conf_np.argmax(axis=1)
    agree_c = (np.asarray(col_arg) == ref_col_arg)[np.asarray(m1)].mean()
    assert agree_c > 0.99, agree_c


def test_fused_matches_equal_dense_path():
    f0, f1, m0, m1 = _features(seed=3)
    conf = dual_softmax_confidence(f0, f1, m0, m1)
    dense = extract_topk_matches(conf, 0.1, 64)
    fused = fused_extract_matches(f0, f1, m0, m1, 0.1, 64, interpret=True)
    for b in range(f0.shape[0]):
        dv = np.asarray(dense.valid[b])
        fv = np.asarray(fused.valid[b])
        d_pairs = {
            (int(i), int(j))
            for i, j in zip(np.asarray(dense.idx0[b])[dv],
                            np.asarray(dense.idx1[b])[dv])
        }
        f_pairs = {
            (int(i), int(j))
            for i, j in zip(np.asarray(fused.idx0[b])[fv],
                            np.asarray(fused.idx1[b])[fv])
        }
        # bf16 rounding may flip borderline-threshold cells; demand >=95% IoU
        inter = len(d_pairs & f_pairs)
        union = len(d_pairs | f_pairs)
        assert union > 20
        assert inter / union > 0.95, (inter, union)


def test_fused_fast_exp_matches_dense_path():
    """Schraudolph fast-exp lse (dsm_fast_exp): ±3% on the normalizer must
    not move the match SET meaningfully — same IoU gate as the exact
    kernel (the perf rationale lives in ops/pallas_dsm._fast_exp)."""
    f0, f1, m0, m1 = _features(seed=7)
    conf = dual_softmax_confidence(f0, f1, m0, m1)
    dense = extract_topk_matches(conf, 0.1, 64)
    fused = fused_extract_matches(
        f0, f1, m0, m1, 0.1, 64, interpret=True, fast_exp=True)
    for b in range(f0.shape[0]):
        dv = np.asarray(dense.valid[b])
        fv = np.asarray(fused.valid[b])
        d_pairs = {
            (int(i), int(j))
            for i, j in zip(np.asarray(dense.idx0[b])[dv],
                            np.asarray(dense.idx1[b])[dv])
        }
        f_pairs = {
            (int(i), int(j))
            for i, j in zip(np.asarray(fused.idx0[b])[fv],
                            np.asarray(fused.idx1[b])[fv])
        }
        inter = len(d_pairs & f_pairs)
        union = len(d_pairs | f_pairs)
        assert union > 20
        assert inter / union > 0.9, (inter, union)


def test_fused_handles_nondivisible_sizes():
    f0, f1, m0, m1 = _features(b=1, l=130, s=77, c=32, seed=5)
    out = fused_extract_matches(f0, f1, m0, m1, 0.05, 32, interpret=True)
    v = np.asarray(out.valid[0])
    assert v.sum() > 5
    assert (np.asarray(out.idx0[0])[v] < 130).all()
    assert (np.asarray(out.idx1[0])[v] < 77).all()


def test_stats_multi_tile_grid_exact():
    """Multi-tile grids (n_i > 1 AND n_j > 1) against numpy logsumexp.

    Regression for the round-4 S-tile indexing bug: spec_f1's block index
    was (0, j) — offsetting the CHANNEL axis, which is out of range for
    j >= 1 and clamps back to tile 0 — so every S-tile after the first
    re-read f1's first tile. Row lse then double-counted tile-0 mass
    (error exactly log 2 with n_j = 2 on match-dominated rows) and column
    stats for j >= 1 came from the wrong features. The original parity
    test used 300x200 features = a single tile and could not catch it.
    """
    rng = np.random.default_rng(11)
    l, s, c = 300, 260, 32
    f0 = rng.normal(0, 1, (l, c)).astype(np.float32)
    f1 = rng.normal(0, 1, (s, c)).astype(np.float32)
    for m in range(40):
        f1[m] = f0[m] + rng.normal(0, 0.05, c)
    m0 = np.ones(l, bool)
    m1 = np.ones(s, bool)
    m0[-7:] = False
    m1[-5:] = False

    temperature = 0.1
    z = (f0 @ f1.T) / (c * temperature)
    z[~m0] = -1e9
    z[:, ~m1] = -1e9
    zmax_r = z.max(1)
    lse_r_np = np.log(np.exp(z - zmax_r[:, None]).sum(1)) + zmax_r
    zmax_c = z.max(0)
    lse_c_np = np.log(np.exp(z - zmax_c[None, :]).sum(0)) + zmax_c
    adj_r = 2 * z - lse_c_np[None, :]

    for tile_l, tile_s in [(128, 64), (64, 128), (128, 128)]:
        out = dual_softmax_stats(
            jnp.asarray(f0), jnp.asarray(f1),
            jnp.asarray(m0), jnp.asarray(m1),
            tile_l=tile_l, tile_s=tile_s, interpret=True,
        )
        lse_r, lse_c, _rmax, rarg = (np.asarray(x) for x in out[:4])
        np.testing.assert_allclose(lse_r[m0], lse_r_np[m0], rtol=0, atol=2e-3)
        np.testing.assert_allclose(lse_c[m1], lse_c_np[m1], rtol=0, atol=2e-3)
        agree = (rarg[m0] == adj_r.argmax(1)[m0]).mean()
        assert agree > 0.995, (tile_l, tile_s, agree)
