"""Alternative matcher families: ASpan-style and MatchFormer-style."""

import jax
import jax.numpy as jnp
import numpy as np

from detectorfreesfm_tpu.models import build_matcher


def _self_match_probe(model, size=64):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, size, size, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img, img)
    out = model.apply(params, img, img)
    v = np.asarray(out.valid[0])
    c0 = np.asarray(out.coords0[0])[v]
    c1 = np.asarray(out.coords1[0])[v]
    return c0, c1, v


def test_aspan_matcher_self_match():
    model = build_matcher("aspan", max_matches=64, match_threshold=0.01,
                          border=1, n_flow_layers=2)
    c0, c1, v = _self_match_probe(model)
    assert v.sum() > 0
    np.testing.assert_allclose(c0, c1, atol=1e-3)


def test_matchformer_matcher_self_match():
    # Untrained attention-in-backbone features are heavily smoothed, so the
    # dual-softmax peaks are weak pre-training — probe at a low threshold;
    # the identity (diagonal) structure is what's asserted.
    model = build_matcher("matchformer", max_matches=64, match_threshold=1e-4,
                          border=1, stage_blocks=(1, 1, 1))
    c0, c1, v = _self_match_probe(model)
    assert v.sum() > 0
    np.testing.assert_allclose(c0, c1, atol=1e-3)


def test_factory_rejects_unknown():
    import pytest

    with pytest.raises(ValueError):
        build_matcher("superglue")
