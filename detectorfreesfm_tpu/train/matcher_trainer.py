"""Coarse-matcher trainer: data-parallel focal-loss training of the
detector-free matcher (LoFTR-class).

The reference uses an upstream-pretrained LoFTR; this framework ships no
weights, so matching quality comes from here: depth-warped cell assignment
(matcher_supervision.py) supervises the dual-softmax confidence with the
focal objective (losses.coarse_focal_loss). Same mesh/sharding shape as the
refiner Trainer: batch of pairs over "data", params replicated, psum grads.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.loftr import DetectorFreeMatcher, MatcherConfig
from .losses import coarse_focal_loss
from .matcher_supervision import pair_cell_assignment
from .optimizers import OptimConfig, build_optimizer


@dataclasses.dataclass(frozen=True)
class MatcherTrainConfig:
    arch: str = "loftr"  # loftr | aspan | matchformer (models.build_matcher)
    matcher: MatcherConfig = MatcherConfig()
    optim: OptimConfig = OptimConfig(backbone_path="backbone")
    grid: int = 8
    seed: int = 66  # the reference's matcher-build seed


class MatcherTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array


class MatcherTrainer:
    def __init__(self, cfg: MatcherTrainConfig = MatcherTrainConfig(),
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        if mesh is None:
            devs = np.asarray(jax.devices())
            mesh = Mesh(devs.reshape(-1, 1), ("data", "model"))
        self.mesh = mesh
        if cfg.arch in ("loftr", "loftr_official", "detectorfree"):
            self.model = DetectorFreeMatcher(cfg.matcher)
        else:
            # Alt matcher families train with the same depth-warp focal
            # objective (they share the dense-conf contract via return_conf)
            from ..models import build_matcher

            self.model = build_matcher(
                cfg.arch,
                match_threshold=cfg.matcher.match_threshold,
                max_matches=cfg.matcher.max_matches,
                compute_dtype=cfg.matcher.compute_dtype,
            )
        self.tx = None
        self._step = None
        self._sup_fn = None

    def init_state(self, sample_batch) -> MatcherTrainState:
        img = jnp.asarray(sample_batch["image0"][:1])
        params = self.model.init(jax.random.PRNGKey(self.cfg.seed), img, img)
        self.tx = build_optimizer(self.cfg.optim, params)
        repl = NamedSharding(self.mesh, P())
        return MatcherTrainState(
            jax.device_put(params, repl),
            jax.device_put(self.tx.init(params), repl),
            jnp.zeros((), jnp.int32),
        )

    def _loss_one(self, params, image0, image1, gt):
        _, conf = self.model.apply(
            params, image0[None], image1[None], return_conf=True, train=False
        )
        return coarse_focal_loss(conf, gt[None])

    def _supervise(self, batch):
        """Depth-warp cell labels for a (padded) pair batch, computed on the
        host CPU backend (the axon TPU pass miscompiles the warp/visibility
        fusion — see Trainer._supervise — so labels are generated off the
        accelerator and fed to the step as plain int arrays)."""
        if self._sup_fn is None:
            grid = self.cfg.grid

            def gen(d0, d1, K0, K1, q0, t0, q1, t1):
                return pair_cell_assignment(
                    d0, d1, K0, K1, q0, t0, q1, t1, grid=grid
                )

            self._sup_fn = jax.jit(jax.vmap(gen), backend="cpu")
        with jax.default_device(jax.devices("cpu")[0]):
            gt = self._sup_fn(*(
                jnp.asarray(np.asarray(batch[k]))
                for k in ("depth0", "depth1", "K0", "K1",
                          "q0", "t0", "q1", "t1")
            ))
        return np.asarray(gt)

    def make_step(self):
        repl = NamedSharding(self.mesh, P())
        data_sh = NamedSharding(self.mesh, P("data"))

        def step_fn(state, batch, live):
            def loss_fn(p):
                losses = jax.vmap(
                    lambda a, b, g: self._loss_one(p, a, b, g)
                )(batch["image0"], batch["image1"], batch["gt"])
                return jnp.sum(losses * live) / jnp.maximum(jnp.sum(live), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            import optax

            params = optax.apply_updates(state.params, updates)
            return MatcherTrainState(params, opt_state, state.step + 1), loss

        self._step = jax.jit(
            step_fn,
            out_shardings=(MatcherTrainState(repl, repl, repl), repl),
        )
        return self._step

    def train_step(self, state, batch):
        if self._step is None:
            self.make_step()
        n = batch["image0"].shape[0]
        n_dev = int(self.mesh.shape["data"])
        n_pad = ((n + n_dev - 1) // n_dev) * n_dev
        live = np.concatenate(
            [np.ones(n, np.float32), np.zeros(n_pad - n, np.float32)]
        )

        def pad(a):
            a = np.asarray(a)
            if n_pad == n:
                return a
            return np.concatenate([a, np.repeat(a[:1], n_pad - n, axis=0)])

        batch = {k: pad(v) for k, v in batch.items()}
        gt = self._supervise(batch)  # host CPU labels
        data_sh = NamedSharding(self.mesh, P("data"))
        device_batch = {
            "image0": jax.device_put(jnp.asarray(batch["image0"]), data_sh),
            "image1": jax.device_put(jnp.asarray(batch["image1"]), data_sh),
            "gt": jax.device_put(jnp.asarray(gt), data_sh),
        }
        live = jax.device_put(jnp.asarray(live), data_sh)
        with self.mesh:
            return self._step(state, device_batch, live)

    def save_checkpoint(self, state, path: str):
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(
                {"params": state.params, "step": int(state.step)}
            ))

    def load_params(self, path: str, template):
        with open(path, "rb") as f:
            blob = f.read()
        # Accept both trainer ckpts ({params, step}) and selfsup bootstrap
        # ckpts ({params}) so --init-ckpt can warm-start from either.
        for skeleton in ({"params": template, "step": 0}, {"params": template}):
            try:
                return serialization.from_bytes(skeleton, blob)["params"]
            except (KeyError, ValueError):
                continue
        raise ValueError(f"unrecognized checkpoint structure: {path}")


def tuple_to_pair_batch(tuples: list) -> dict:
    """First two views of each trainer tuple -> matcher pair batch."""
    out = {k: [] for k in ("image0", "image1", "depth0", "depth1",
                           "K0", "K1", "q0", "t0", "q1", "t1")}
    for tup in tuples:
        out["image0"].append(tup["images"][0])
        out["image1"].append(tup["images"][1])
        out["depth0"].append(tup["depths"][0])
        out["depth1"].append(tup["depths"][1])
        out["K0"].append(tup["K"][0])
        out["K1"].append(tup["K"][1])
        out["q0"].append(tup["qvec"][0])
        out["t0"].append(tup["tvec"][0])
        out["q1"].append(tup["qvec"][1])
        out["t1"].append(tup["tvec"][1])
    return {k: np.stack(v) for k, v in out.items()}
