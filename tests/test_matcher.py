import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectorfreesfm_tpu.models.loftr import DetectorFreeMatcher, MatcherConfig
from detectorfreesfm_tpu.ops import attention as A
from detectorfreesfm_tpu.ops import dual_softmax as DS
from detectorfreesfm_tpu.ops import dsnt
from detectorfreesfm_tpu.ops import roi_align as RA


def test_linear_attention_matches_full_for_uniform():
    # With a single kv token, linear and full attention must both return v
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 5, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 1, 4, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 1, 4, 8)), jnp.float32)
    out_lin = A.linear_attention(q, k, v)
    out_full = A.full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_lin), np.broadcast_to(np.asarray(v), out_lin.shape), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_full), np.broadcast_to(np.asarray(v), out_full.shape), atol=1e-4)


def test_linear_attention_bf16_matches_fp32_long_sequence():
    # The bf16 path (bf16 feature maps, fp32 MXU accumulation) must agree
    # with the fp32 path at a realistic coarse-map sequence length.
    # ADVICE r2 #1: the changed TPU numerics were untested.
    rng = np.random.default_rng(7)
    L = 4096
    q = rng.normal(size=(1, L, 4, 16)).astype(np.float32)
    k = rng.normal(size=(1, L, 4, 16)).astype(np.float32)
    v = rng.normal(size=(1, L, 4, 16)).astype(np.float32)
    mask = np.ones((1, L), bool)
    mask[:, -100:] = False
    out32 = np.asarray(A.linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        q_mask=jnp.asarray(mask), kv_mask=jnp.asarray(mask)))
    out16 = np.asarray(A.linear_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16),
        q_mask=jnp.asarray(mask), kv_mask=jnp.asarray(mask)
    ).astype(jnp.float32))
    # bf16 inputs carry ~3 decimal digits; outputs are O(0.1) after the
    # normalizing Z, so absolute 2e-2 / relative ~2% is the honest budget.
    err = np.abs(out16 - out32)
    assert np.median(err) < 5e-3
    assert err.max() < 5e-2


def test_full_attention_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 3, 2, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 6, 2, 4)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 6, 2, 4)), jnp.float32)
    kv_mask = jnp.asarray([[True, True, False, False, False, False]])
    out = A.full_attention(q, k, v, kv_mask=kv_mask)
    out_ref = A.full_attention(q, k[:, :2], v[:, :2])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)


def test_dual_softmax_identity_features():
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.normal(size=(1, 32, 16)), jnp.float32) * 3
    conf = DS.dual_softmax_confidence(f, f)
    mnn = DS.mutual_nearest_mask(conf)
    # identity cells must be the mutual nearest neighbors
    diag = np.asarray(mnn)[0][np.arange(32), np.arange(32)]
    assert diag.all()


def test_extract_topk_static_shape():
    rng = np.random.default_rng(3)
    conf = jnp.asarray(rng.uniform(size=(2, 10, 10)), jnp.float32) * 0.1
    conf = conf.at[0, 3, 7].set(0.9)
    conf = conf.at[1, 2, 2].set(0.8)
    m = DS.extract_topk_matches(conf, threshold=0.5, k=4)
    assert m.idx0.shape == (2, 4)
    v = np.asarray(m.valid)
    assert v[0].sum() == 1 and v[1].sum() == 1
    assert (np.asarray(m.idx0)[0, 0], np.asarray(m.idx1)[0, 0]) == (3, 7)


def test_dsnt_expectation():
    heat = np.full((1, 7, 7), -50.0, np.float32)
    heat[0, 2, 5] = 50.0  # delta at row 2, col 5
    coords, std = dsnt.soft_argmax_refine(jnp.asarray(heat), normalized=False)
    np.testing.assert_allclose(np.asarray(coords)[0], [5.0, 2.0], atol=1e-3)
    assert np.asarray(std)[0] < 0.01


def test_roi_align_constant_and_gradient_field():
    # Bilinear sampling of a linear ramp must reproduce exact values
    h, w = 16, 20
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    feat = np.stack([xs, ys], axis=-1)[None]  # (1, H, W, 2), f(x, y) = (x, y)
    centers = jnp.asarray([[5.25, 7.75], [10.0, 3.5]], jnp.float32)
    idx = jnp.asarray([0, 0], jnp.int32)
    patches = RA.extract_patches(jnp.asarray(feat), centers, idx, patch_size=5)
    p = np.asarray(patches)
    # center sample equals the center coordinate
    np.testing.assert_allclose(p[0, 2, 2], [5.25, 7.75], atol=1e-5)
    np.testing.assert_allclose(p[1, 2, 2], [10.0, 3.5], atol=1e-5)
    # unit spacing along the grid
    np.testing.assert_allclose(p[0, 2, 3, 0] - p[0, 2, 2, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(p[0, 3, 2, 1] - p[0, 2, 2, 1], 1.0, atol=1e-5)


def test_crop_and_resize_box_corners():
    h, w = 12, 12
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    feat = np.stack([xs, ys], axis=-1)[None]
    boxes = jnp.asarray([[2.0, 3.0, 8.0, 9.0]], jnp.float32)
    out = RA.crop_and_resize(jnp.asarray(feat), boxes, jnp.asarray([0]), (4, 4))
    o = np.asarray(out)
    np.testing.assert_allclose(o[0, 0, 0], [2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(o[0, -1, -1], [8.0, 9.0], atol=1e-5)


@pytest.mark.parametrize("fine", [False, True])
def test_matcher_self_match_identity(fine):
    """Matching an image against itself: with identical features the
    dual-softmax diagonal dominates, so all valid matches must be i == i."""
    cfg = MatcherConfig(max_matches=64, fine_enabled=fine, match_threshold=0.1)
    model = DetectorFreeMatcher(cfg)
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    out = model.apply(variables, img, img)
    v = np.asarray(out.valid)[0]
    assert out.coords0.shape == (1, 64, 2)
    if v.any():
        c0 = np.asarray(out.coords0)[0][v]
        c1 = np.asarray(out.coords1)[0][v]
        if not fine:
            np.testing.assert_allclose(c0, c1, atol=1e-5)
        else:
            assert np.abs(c0 - c1).max() < 4.0  # subpixel stage may shift


def test_matcher_jit_and_batch():
    cfg = MatcherConfig(max_matches=32)
    model = DetectorFreeMatcher(cfg)
    rng = np.random.default_rng(5)
    img0 = jnp.asarray(rng.uniform(size=(2, 64, 96, 1)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(size=(2, 64, 96, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, img1)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    out = fwd(variables, img0, img1)
    assert out.coords0.shape == (2, 32, 2)
    assert np.asarray(out.conf).shape == (2, 32)


def test_position_encoding_no_tracer_leak_across_jits():
    """The PE table cache must not leak one jit trace's constants into the
    next (regression: second scene of an eval run crashed with
    UnexpectedTracerError because _pe_table cached a traced jnp constant)."""
    from detectorfreesfm_tpu.models import position_encoding as PE

    PE._pe_table.cache_clear()
    x = jnp.ones((1, 16, 16, 8), jnp.float32)
    out1 = jax.jit(PE.add_position_encoding)(x)  # populates the cache
    out2 = jax.jit(PE.add_position_encoding)(x)  # fresh trace, cached table
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


@pytest.mark.parametrize("variant,coarse_red,fine_red,cdim,fdim", [
    ("8_1", 8, 1, 196, 64),
    ("4_1", 4, 1, 128, 64),
    ("2_1", 2, 1, 96, 64),
    ("16_4", 16, 4, 384, 196),
])
def test_resnetfpn_variant_shapes(variant, coarse_red, fine_red, cdim, fdim):
    """The generic ResNetFPN must hit every reference variant's contract
    (coarse/fine reduction factors + channel widths,
    src/MultiviewMatcher/backbone/resnet.py:85-520)."""
    from detectorfreesfm_tpu.models.backbone import build_resnetfpn

    net = build_resnetfpn(variant)
    x = jnp.ones((1, 64, 96, 1), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    coarse, fine = jax.jit(lambda v, a: net.apply(v, a))(variables, x)
    assert coarse.shape == (1, 64 // coarse_red, 96 // coarse_red, cdim)
    assert fine.shape == (1, 64 // fine_red, 96 // fine_red, fdim)
    assert bool(jnp.isfinite(coarse).all()) and bool(jnp.isfinite(fine).all())


def test_resnetfpn_variant_8_2_is_canonical_class():
    from detectorfreesfm_tpu.models.backbone import (
        ResNetFPN_8_2, build_resnetfpn,
    )

    assert isinstance(build_resnetfpn("8_2"), ResNetFPN_8_2)
    with pytest.raises(ValueError):
        build_resnetfpn("32_8")
