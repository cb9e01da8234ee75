"""Homography self-supervised matcher training."""

import jax
import jax.numpy as jnp
import numpy as np

from detectorfreesfm_tpu.train.homography import (
    homography_cell_assignment,
    make_selfsup_batch,
    random_homography,
    warp_image,
)


def test_warp_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 32)).astype(np.float32))
    out = warp_image(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_translation_and_assignment():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64)).astype(np.float32))
    H = jnp.asarray(np.array([[1.0, 0, 16.0], [0, 1.0, 8.0], [0, 0, 1.0]]))
    out = np.asarray(warp_image(img, H))
    # shifted content: out[y+8, x+16] == img[y, x]
    np.testing.assert_allclose(out[8:, 16:], np.asarray(img)[:-8, :-16], atol=1e-4)
    gt = np.asarray(homography_cell_assignment(H, 64, 64, 8))
    # cell (0,0) center (4,4) -> (20,12) -> cell x=2, y=1 -> idx 1*8+2
    assert gt[0] == 10
    # cells whose warp exits the frame are -1
    assert gt[7] == -1  # center x=60 -> 76 > 63


def test_selfsup_batch_and_short_training():
    """A few steps on one image must reduce the focal loss."""
    from detectorfreesfm_tpu.models.loftr import DetectorFreeMatcher, MatcherConfig
    from detectorfreesfm_tpu.train.losses import coarse_focal_loss
    import optax

    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (2, 64, 64)).astype(np.float32)
    cfg = MatcherConfig(max_matches=32, border=1)
    model = DetectorFreeMatcher(cfg)
    key = jax.random.PRNGKey(0)
    data = make_selfsup_batch(imgs, key)
    assert data["gt"].shape == (2, 64)
    assert int((data["gt"] >= 0).sum()) > 30

    params = model.init(key, data["image0"][:1], data["image1"][:1])
    tx = optax.adam(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, im0, im1, gt):
        def loss_fn(p):
            _, conf = model.apply(p, im0, im1, return_conf=True)
            return coarse_focal_loss(conf, gt)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for i in range(16):
        params, opt, loss = step(params, opt, data["image0"], data["image1"], data["gt"])
        losses.append(float(loss))
    # Overfitting one fixed batch must trend down (allow early oscillation)
    assert min(losses[8:]) < losses[0], losses


def test_refiner_selfsup_training_reduces_loss(tmp_path):
    """A short self-sup refiner run on one synthetic image must reduce loss
    and produce a loadable checkpoint."""
    from PIL import Image as PILImage

    from detectorfreesfm_tpu.models.multiview_matcher import RefinerConfig
    from detectorfreesfm_tpu.train.refiner_selfsup import (
        load_refiner_params,
        train_refiner_selfsup,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(4)
    for i in range(2):
        PILImage.fromarray(
            rng.integers(0, 255, (96, 96), dtype=np.uint8), "L"
        ).save(d / f"im{i}.png")
    out = str(tmp_path / "refiner.msgpack")
    cfg = RefinerConfig(crop_size=11, window=7)
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        params = train_refiner_selfsup(
            str(d), out, steps=30, img_size=96, n_views=3, n_tracks=32,
            lr=5e-4, log_every=5, refiner_cfg=cfg,
        )
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("step")]
    losses = [float(l.split("loss ")[1].split()[0]) for l in lines]
    assert len(losses) >= 4
    assert min(losses[2:]) < losses[0], losses
    restored = load_refiner_params(out, cfg=cfg)
    a = jax.tree_util.tree_leaves(restored)[0]
    b = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
