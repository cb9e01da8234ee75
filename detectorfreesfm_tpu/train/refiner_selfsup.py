"""Homography self-supervised training for the multiview refiner.

The refiner's depth-supervised trainer (train/trainer.py) needs depth maps;
this path needs only images: view 0 is the original, views 1..V-1 are random
homography warps, and every sampled track point's exact location in each
warp is known analytically. Query inputs are jittered (the coarse-matching
noise the refiner learns to undo), targets are the exact warped coordinates
— the same objective as the reference's perturb-and-recover supervision
(src/refinement_models/utils/supervision.py) with H replacing depth.

One fused jitted step per iteration (view synthesis + track sampling +
refiner fwd/bwd + update), matching train/selfsup.py's dispatch discipline.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..data.images import load_gray
from ..models.multiview_matcher import MultiviewRefiner, RefinerConfig
from .homography import random_homography, warp_image
from .losses import fine_l2_std_loss


def train_refiner_selfsup(
    image_dir: str,
    out_path: str,
    steps: int = 1000,
    img_size: int = 256,
    n_views: int = 4,
    n_tracks: int = 128,
    jitter_px: float = 2.0,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
    refiner_cfg: Optional[RefinerConfig] = None,
    init_params=None,
):
    """Returns trained refiner params (also serialized to out_path)."""
    names = sorted(
        f for f in os.listdir(image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
    )
    assert names, f"no images in {image_dir}"
    imgs = np.stack([
        load_gray(os.path.join(image_dir, n), long_side=img_size,
                  pad_to=img_size).data
        for n in names
    ])

    cfg = refiner_cfg or RefinerConfig()
    model = MultiviewRefiner(cfg)
    rng = jax.random.PRNGKey(seed)
    v, t = n_views, n_tracks
    if init_params is not None:
        params = init_params
    else:
        params = model.init(
            rng, jnp.zeros((v, img_size, img_size, 1)),
            jnp.zeros((t, v), jnp.int32), jnp.zeros((t, v, 2), jnp.float32),
            jnp.ones((t, v), jnp.float32), jnp.zeros((t, v), bool),
        )
    sched = optax.cosine_decay_schedule(lr, steps)
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adamw(sched))
    opt_state = tx.init(params)
    imgs_dev = jnp.asarray(imgs)
    margin = cfg.crop_size  # keep crops inside the frame

    @jax.jit
    def step_fn(params, opt_state, imgs_dev, key):
        ki, kh, kp, kj, kr = jax.random.split(key, 5)
        src = imgs_dev[jax.random.randint(ki, (), 0, imgs_dev.shape[0])]
        h = w = img_size
        Hs = jax.vmap(lambda k: random_homography(k, h, w))(
            jax.random.split(kh, v - 1)
        )
        views = jnp.concatenate(
            [src[None], jax.vmap(warp_image, in_axes=(None, 0))(src, Hs)]
        )[..., None]                                        # (V, S, S, 1)

        # Sample reference points and their exact warp targets
        pts = jax.random.uniform(
            kp, (t, 2), minval=margin, maxval=img_size - margin
        )
        ones = jnp.ones((t, 1), jnp.float32)
        ph = jnp.concatenate([pts, ones], -1)               # (T, 3)
        dst = jnp.einsum("vij,tj->vti", Hs, ph)             # (V-1, T, 3)
        z = jnp.where(jnp.abs(dst[..., 2:]) < 1e-6, 1e-6, dst[..., 2:])
        q_gt = jnp.clip(dst[..., :2] / z, -4.0 * img_size, 4.0 * img_size)
        gt = jnp.concatenate([pts[None], q_gt]).transpose(1, 0, 2)  # (T, V, 2)
        in_frame = (
            (gt[..., 0] >= margin) & (gt[..., 0] < img_size - margin)
            & (gt[..., 1] >= margin) & (gt[..., 1] < img_size - margin)
        )
        mask = in_frame.at[:, 0].set(True)

        jit_q = jax.random.uniform(
            kj, (t, v, 2), minval=-jitter_px, maxval=jitter_px
        ).at[:, 0].set(0.0)
        node_xy = (gt + jit_q).astype(jnp.float32)
        node_img = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[None], (t, v))
        node_scale = jnp.ones((t, v), jnp.float32)

        def loss_fn(p):
            out = model.apply(p, views, node_img, node_xy, node_scale, mask)
            m = mask[:, 1:]
            return fine_l2_std_loss(
                out.coords[:, 1:], gt[:, 1:], out.std[:, 1:], m
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for it in range(steps):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step_fn(params, opt_state, imgs_dev, k)
        if (it + 1) % log_every == 0:
            rate = (it + 1) / (time.time() - t0)
            print(f"step {it + 1}/{steps} loss {float(loss):.4f} "
                  f"({rate:.2f} it/s)", flush=True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes({"params": params}))
    return params


def load_refiner_params(path: str, cfg: Optional[RefinerConfig] = None,
                        img_size: int = 64, n_views: int = 4, n_tracks: int = 8):
    cfg = cfg or RefinerConfig()
    model = MultiviewRefiner(cfg)
    # Template init on the CPU backend: it only provides the restore
    # structure/dtypes (plus fresh leaves for subtrees a ckpt may lack), and
    # eager init over the TPU tunnel costs minutes of dispatch latency.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((n_views, img_size, img_size, 1)),
            jnp.zeros((n_tracks, n_views), jnp.int32),
            jnp.zeros((n_tracks, n_views, 2), jnp.float32),
            jnp.ones((n_tracks, n_views), jnp.float32),
            jnp.zeros((n_tracks, n_views), bool),
        )
    from .selfsup import _from_bytes_any

    with open(path, "rb") as f:
        blob = f.read()
    loaded = _from_bytes_any(template, blob, path)
    return jax.tree_util.tree_map(
        lambda t, l: jnp.asarray(l, t.dtype), template, loaded
    )
