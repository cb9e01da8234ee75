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
from .losses import coarse_focal_loss, fine_l2_std_loss
from .matcher_supervision import pair_cell_assignment
from .optimizers import OptimConfig, build_optimizer


@dataclasses.dataclass(frozen=True)
class MatcherTrainConfig:
    arch: str = "loftr"  # loftr | aspan | matchformer (models.build_matcher)
    matcher: MatcherConfig = MatcherConfig()
    optim: OptimConfig = OptimConfig(backbone_path="backbone")
    grid: int = 8
    seed: int = 66  # the reference's matcher-build seed
    # Joint fine-stage training (matcher.fine_enabled=True): teacher-force
    # the fine head at n_fine GT coarse cells per pair and supervise the
    # sub-cell residual (LoFTR spvs_fine / fine loss,
    # third_party/LoFTR/src/loftr/utils/supervision.py + losses/loftr_loss.py)
    n_fine: int = 128
    fine_loss_weight: float = 1.0


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

    def _loss_one(self, params, image0, image1, gt, uv1):
        if not self.cfg.matcher.fine_enabled:
            _, conf = self.model.apply(
                params, image0[None], image1[None], return_conf=True,
                train=False
            )
            return coarse_focal_loss(conf, gt[None])
        # Joint coarse+fine: teacher-force the fine head at n_fine GT cells.
        # Deterministic multiplicative-hash tiebreak spreads the selection
        # over the image instead of biasing to low row indices.
        L = gt.shape[0]
        w8 = image0.shape[1] // self.cfg.grid
        valid = gt >= 0
        idx = jnp.arange(L, dtype=jnp.uint32)
        tie = ((idx * jnp.uint32(2654435761)) % 65536).astype(
            jnp.float32) / 65536.0
        kf = min(self.cfg.n_fine, L)
        _, sel = jax.lax.top_k(valid.astype(jnp.float32) + tie, kf)
        sel = sel.astype(jnp.int32)
        idx0 = sel
        idx1 = jnp.clip(gt[sel], 0)
        _, conf, (delta, std) = self.model.apply(
            params, image0[None], image1[None], return_conf=True,
            train=False, fine_at=(idx0[None], idx1[None]),
        )
        coarse = coarse_focal_loss(conf, gt[None])
        # GT sub-cell residual, normalized by the fine half-window (4 px):
        # cell coords are top-left * grid, exactly the model's to_xy
        cell_xy1 = jnp.stack(
            [(idx1 % w8).astype(jnp.float32) * self.cfg.grid,
             (idx1 // w8).astype(jnp.float32) * self.cfg.grid], -1)
        off = (uv1[sel] - cell_xy1) / 4.0
        m = valid[sel] & (jnp.max(jnp.abs(off), axis=-1) < 1.0)
        fine = fine_l2_std_loss(delta[0] / 4.0, off, std[0], m)
        return coarse + self.cfg.fine_loss_weight * fine

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
            gt, uv1 = self._sup_fn(*(
                jnp.asarray(np.asarray(batch[k]))
                for k in ("depth0", "depth1", "K0", "K1",
                          "q0", "t0", "q1", "t1")
            ))
        return np.asarray(gt), np.asarray(uv1)

    def make_step(self):
        repl = NamedSharding(self.mesh, P())
        data_sh = NamedSharding(self.mesh, P("data"))

        def step_fn(state, batch, live):
            def loss_fn(p):
                losses = jax.vmap(
                    lambda a, b, g, u: self._loss_one(p, a, b, g, u)
                )(batch["image0"], batch["image1"], batch["gt"],
                  batch["uv1"])
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
        gt, uv1 = self._supervise(batch)  # host CPU labels
        data_sh = NamedSharding(self.mesh, P("data"))
        device_batch = {
            "image0": jax.device_put(jnp.asarray(batch["image0"]), data_sh),
            "image1": jax.device_put(jnp.asarray(batch["image1"]), data_sh),
            "gt": jax.device_put(jnp.asarray(gt), data_sh),
            "uv1": jax.device_put(jnp.asarray(uv1), data_sh),
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
        """Warm-start from a checkpoint, tolerating structure mismatch.

        Accepts trainer ckpts ({params, step}) and selfsup bootstrap ckpts
        ({params}); subtrees absent from the checkpoint (e.g. the fine_match
        head when warm-starting a joint coarse+fine run from a coarse-only
        checkpoint) keep their fresh initialization."""
        with open(path, "rb") as f:
            blob = f.read()
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
            a = jnp.asarray(s)
            if a.shape != jnp.shape(t):
                raise ValueError(
                    f"shape mismatch at {pathk}: ckpt {a.shape} vs "
                    f"model {jnp.shape(t)}"
                )
            return a.astype(jnp.asarray(t).dtype)

        merged = merge(template, src)
        if missing:
            print(f"warm-start: {len(missing)} fresh subtrees kept "
                  f"(not in ckpt): {missing[:4]}{'...' if len(missing) > 4 else ''}")
        return merged


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
