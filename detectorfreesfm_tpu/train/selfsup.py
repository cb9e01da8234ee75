"""Self-supervised matcher bootstrap: train on a folder of images.

Ties train/homography.py to the coarse focal loss in one data-parallel jitted
step. Photometric jitter (brightness/contrast/noise, applied independently to
both views) keeps the matcher from shortcutting on raw intensities.

Typical use: bootstrap weights for the demo scene / smoke runs —
  python -m detectorfreesfm_tpu.cli train-matcher-selfsup \\
      --images <dir> --output ckpt.msgpack --steps 1000
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
from ..models.loftr import DetectorFreeMatcher, MatcherConfig
from .homography import make_selfsup_batch
from .losses import coarse_focal_loss


def _photometric(rng, img):
    k1, k2, k3 = jax.random.split(rng, 3)
    gain = jnp.exp(jax.random.uniform(k1, (), minval=-0.3, maxval=0.3))
    bias = jax.random.uniform(k2, (), minval=-0.15, maxval=0.15)
    noise = jax.random.normal(k3, img.shape) * 0.02
    return jnp.clip(img * gain + bias + noise, 0.0, 1.0)


def train_matcher_selfsup(
    image_dir: str,
    out_path: str,
    steps: int = 1000,
    img_size: int = 416,
    batch: int = 4,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
    compute_dtype: str = "float32",
    init_params=None,
    matcher_cfg: Optional[MatcherConfig] = None,
    aug_strength: float = 1.0,  # scales homography rotation/scale/persp jitter
):
    """Returns trained params (also serialized to out_path)."""
    names = sorted(
        f for f in os.listdir(image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
    )
    assert names, f"no images in {image_dir}"
    imgs = np.stack([
        load_gray(os.path.join(image_dir, n), long_side=img_size,
                  pad_to=img_size).data
        for n in names
    ])  # (N, S, S)

    cfg = matcher_cfg or MatcherConfig(compute_dtype=compute_dtype)
    model = DetectorFreeMatcher(cfg)
    rng = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((1, img_size, img_size, 1), jnp.float32)
    params = init_params if init_params is not None else model.init(rng, x0, x0)
    sched = optax.cosine_decay_schedule(lr, steps)
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adamw(sched, weight_decay=1e-8))
    opt_state = tx.init(params)
    imgs_dev = jnp.asarray(imgs)  # resident on device for the whole run

    from .homography import homography_cell_assignment, random_homography, warp_image

    # ONE jitted program per step: batch selection, homography synthesis,
    # warping, supervision, fwd+bwd, update — a single device dispatch
    # (separate dispatches paid tunnel latency + reshipped images per step).
    @jax.jit
    def step_fn(params, opt_state, imgs_dev, key):
        kb, kh, kp0, kp1 = jax.random.split(key, 4)
        idx = jax.random.randint(kb, (batch,), 0, imgs_dev.shape[0])
        src = jnp.take(imgs_dev, idx, axis=0)                  # (B, S, S)
        h = w = img_size
        Hs = jax.vmap(lambda k: random_homography(
            k, h, w,
            max_rotation=0.35 * aug_strength,
            max_scale=0.25 * aug_strength,
            max_translation=0.15,
            max_perspective=3e-4 * aug_strength,
        ))(jax.random.split(kh, batch))
        warped = jax.vmap(warp_image)(src, Hs)
        gt = jax.vmap(lambda Hm: homography_cell_assignment(Hm, h, w))(Hs)

        def loss_fn(p):
            a = jax.vmap(_photometric)(
                jax.random.split(kp0, batch), src[..., None]
            )
            b = jax.vmap(_photometric)(
                jax.random.split(kp1, batch), warped[..., None]
            )
            _, conf = model.apply(p, a, b, return_conf=True)
            return coarse_focal_loss(conf, gt)

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


def load_matcher_params(path: str, img_size: int = 416,
                        cfg: Optional[MatcherConfig] = None):
    """Load params serialized by train_matcher_selfsup (or MatcherTrainer).

    Checkpoints may be stored bf16 (the in-repo demo weights are, for size);
    leaves are cast back to the template dtype.
    """
    cfg = cfg or MatcherConfig()
    model = DetectorFreeMatcher(cfg)
    x0 = jnp.zeros((1, img_size, img_size, 1), jnp.float32)
    # Template init on CPU: structure/dtypes only (+ fresh leaves for
    # subtrees the ckpt may lack) — eager init over the TPU tunnel costs
    # minutes of dispatch latency per load.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        template = model.init(jax.random.PRNGKey(0), x0, x0)
    with open(path, "rb") as f:
        blob = f.read()
    loaded = _from_bytes_any(template, blob, path)
    return jax.tree_util.tree_map(
        lambda t, l: jnp.asarray(l, t.dtype), template, loaded
    )


def _from_bytes_any(template, blob: bytes, path: str):
    """Restore params from either {params} or {params, step} checkpoints.

    Subtrees absent from the checkpoint (e.g. the fine_match head when a
    coarse-only checkpoint is loaded into a fine_enabled model) keep the
    template's fresh initialization — a loud warning is printed, since
    matching with a random fine head degrades coordinates."""
    for skeleton in ({"params": template}, {"params": template, "step": 0}):
        try:
            return serialization.from_bytes(skeleton, blob)["params"]
        except (KeyError, ValueError):
            continue
    raw = serialization.msgpack_restore(blob)
    src = raw.get("params", raw)
    missing = []

    def merge(t, s, pathk=""):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                if isinstance(s, dict) and k in s:
                    out[k] = merge(v, s[k], f"{pathk}/{k}")
                else:
                    missing.append(f"{pathk}/{k}")
                    out[k] = v
            return out
        return s

    merged = merge(template, src)
    if missing:
        print(f"warning: checkpoint {path} lacks {len(missing)} subtrees "
              f"(kept at random init): {missing[:4]}"
              f"{'...' if len(missing) > 4 else ''}")
        return merged
    raise ValueError(f"unrecognized checkpoint structure: {path}")
