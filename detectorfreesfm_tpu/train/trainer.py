"""Multiview-refiner trainer: data-parallel jitted train/eval steps.

Replaces the reference's PyTorch-Lightning DDP harness
(src/refinement_models/lightning_model.py:18-184, trainer_config.yaml): one
jitted train step over a ("data",) mesh — batch of image tuples sharded over
devices, params/opt-state replicated, XLA psum for gradient reduction —
instead of NCCL DDP. Supervision (depth-warp GT tracks) is generated inside
the step (reference computes it on-the-fly too), loss is the L2-with-std fine
loss, and gradients are clipped at the reference's 0.5.

Checkpointing: orbax-free flat msgpack via flax.serialization (framework-
native, no external service).
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.multiview_matcher import MultiviewRefiner, RefinerConfig
from .losses import fine_l2_std_loss
from .optimizers import OptimConfig, build_optimizer
from .supervision import generate_tracks


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    refiner: RefinerConfig = RefinerConfig()
    optim: OptimConfig = OptimConfig()
    n_tracks: int = 200
    grid_step: int = 8
    visibility_tolerance: int = 3
    seed: int = 12345  # reference training seed


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array


class Trainer:
    """Owns the mesh, the jitted steps, and checkpoint IO."""

    def __init__(self, cfg: TrainConfig = TrainConfig(), mesh: Optional[Mesh] = None):
        self.cfg = cfg
        if mesh is None:
            devs = np.asarray(jax.devices())
            mesh = Mesh(devs.reshape(-1, 1), ("data", "model"))
        self.mesh = mesh
        self.model = MultiviewRefiner(cfg.refiner)
        self.tx = None
        self._train_step = None
        self._sup_fn = None

    # -- setup -----------------------------------------------------------------

    def init_state(self, sample_batch, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        images, depths, K, qvec, tvec = (
            sample_batch[k] for k in ("images", "depths", "K", "qvec", "tvec")
        )
        v = images.shape[1]
        t = self.cfg.n_tracks
        params = self.model.init(
            rng,
            jnp.asarray(images[0]),
            jnp.zeros((t, v), jnp.int32),
            jnp.zeros((t, v, 2), jnp.float32),
            jnp.ones((t, v), jnp.float32),
            jnp.zeros((t, v), bool),
        )
        self.tx = build_optimizer(self.cfg.optim, params)
        opt_state = self.tx.init(params)
        repl = NamedSharding(self.mesh, P())
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    # -- the step ----------------------------------------------------------------

    def _loss_one(self, params, images, spv):
        """Loss for ONE image tuple (images (V, H, W, 1), spv precomputed)."""
        out = self.model.apply(
            params, images, spv.node_img, spv.node_xy,
            spv.node_scale, spv.node_mask,
        )
        # Only query views (>=1) carry loss; reference view is the anchor
        mask = spv.node_mask[:, 1:] & spv.track_valid[:, None]
        return fine_l2_std_loss(
            out.coords[:, 1:], spv.gt_xy[:, 1:], out.std[:, 1:], mask
        )

    def _supervise(self, batch, rng):
        """Generate depth-warp labels for a (padded) batch ON THE HOST CPU
        backend and return them as a batched SupervisionBatch.

        The axon TPU pass miscompiles the warp/visibility fusion (a bounded
        Xc_src acquires an all-inf channel, every cycle check fails, and the
        masked loss silently evaluates to exactly 0), so labels never touch
        the accelerator compiler: same jnp code, jitted for the CPU backend,
        shipped to the device as plain batch arrays."""
        cfg = self.cfg
        if self._sup_fn is None:
            def gen(d, K, q, t, r):
                return generate_tracks(
                    d, K, q, t, r,
                    grid_step=cfg.grid_step, n_tracks=cfg.n_tracks,
                    visibility_tolerance=cfg.visibility_tolerance,
                )

            self._sup_fn = jax.jit(jax.vmap(gen), backend="cpu")
        b = batch["depths"].shape[0]
        with jax.default_device(jax.devices("cpu")[0]):
            rngs = jax.random.split(jnp.asarray(np.asarray(rng)), b)
            spv = self._sup_fn(
                jnp.asarray(np.asarray(batch["depths"])),
                jnp.asarray(np.asarray(batch["K"])),
                jnp.asarray(np.asarray(batch["qvec"])),
                jnp.asarray(np.asarray(batch["tvec"])), rngs,
            )
        return jax.tree_util.tree_map(np.asarray, spv)

    def make_train_step(self):
        repl = NamedSharding(self.mesh, P())
        data_sh = NamedSharding(self.mesh, P("data"))

        def step_fn(state: TrainState, batch, live):
            def loss_fn(p):
                losses = jax.vmap(
                    lambda im, s: self._loss_one(p, im, s)
                )(batch["images"], batch["spv"])
                # `live` masks batch-padding rows (batch padded to a device
                # multiple so any per-host batch size shards over the mesh)
                return jnp.sum(losses * live) / jnp.maximum(jnp.sum(live), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            return TrainState(params, opt_state, state.step + 1), loss

        self._train_step = jax.jit(
            step_fn,
            out_shardings=(TrainState(repl, repl, repl), repl),
        )
        return self._train_step

    def train_step(self, state: TrainState, batch, rng):
        if self._train_step is None:
            self.make_train_step()
        n = next(iter(batch.values())).shape[0]
        n_dev = int(self.mesh.shape["data"])
        n_pad = ((n + n_dev - 1) // n_dev) * n_dev
        live = np.concatenate(
            [np.ones(n, np.float32), np.zeros(n_pad - n, np.float32)]
        )

        def pad(a):
            a = np.asarray(a)
            if n_pad == n:
                return a
            reps = np.repeat(a[:1], n_pad - n, axis=0)
            return np.concatenate([a, reps])

        batch = {k: pad(v) for k, v in batch.items()}
        spv = self._supervise(batch, rng)  # host CPU, see _supervise
        data_sh = NamedSharding(self.mesh, P("data"))
        device_batch = {
            "images": jax.device_put(jnp.asarray(batch["images"]), data_sh),
            "spv": jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), data_sh), spv
            ),
        }
        live = jax.device_put(jnp.asarray(live), data_sh)
        with self.mesh:
            return self._train_step(state, device_batch, live)

    # -- checkpointing -------------------------------------------------------------

    def save_checkpoint(self, state: TrainState, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(
                {"params": state.params, "step": int(state.step)}
            ))

    def load_params(self, path: str, template_params):
        with open(path, "rb") as f:
            blob = f.read()
        # Accept both trainer ckpts ({params, step}) and bootstrap ckpts
        # ({params} only) so --init-ckpt warm-starts from either.
        for skeleton in ({"params": template_params, "step": 0},
                         {"params": template_params}):
            try:
                return serialization.from_bytes(skeleton, blob)["params"]
            except (KeyError, ValueError):
                continue
        raise ValueError(f"unrecognized checkpoint structure: {path}")


def epipolar_pose_eval(coords, gt, mask) -> dict:
    """Light eval: mean/median refined-vs-GT pixel error over valid queries
    (the reference additionally runs RANSAC relative-pose AUC per pair —
    lightning_model.py:88-180; that path reuses eval/pose_auc on host)."""
    err = np.linalg.norm(np.asarray(coords) - np.asarray(gt), axis=-1)
    m = np.asarray(mask)
    live = err[m]
    return {
        "mean_px": float(live.mean()) if live.size else float("nan"),
        "median_px": float(np.median(live)) if live.size else float("nan"),
    }
