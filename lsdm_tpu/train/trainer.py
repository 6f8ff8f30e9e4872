"""Training and evaluation steps + the epoch loop.

TPU re-design of the reference trainer (``run/train_sdm.py:30-183``):

  * one jitted, donated train step: q_sample + denoiser forward +
    chamfer/CE loss + AdamW update + BatchNorm stats, all fused on device;
  * timestep sampling on device (uniform, ``run/train_sdm.py:32``);
  * validation runs the *scanned* sampler (1000 sequential denoiser calls in
    one compiled loop vs. the reference's 1000 Python-driven launches,
    ``run/train_sdm.py:110-183``);
  * data-parallel by construction: pass a Mesh and batches get sharded on
    the ``data`` axis; gradients/metrics are reduced by XLA SPMD.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lsdm_tpu.config import DiffusionConfig, SDMConfig, TrainConfig
from lsdm_tpu.data.dataset import Batch, DataLoader
from lsdm_tpu.diffusion import make_schedule, training_losses
from lsdm_tpu.models.sdm import SceneDiffusionModel
from lsdm_tpu.ops.metrics import topk_accuracy
from lsdm_tpu.ops.pointcloud import chamfer_distance
from lsdm_tpu.parallel import mesh as mesh_lib
from lsdm_tpu.train import checkpoint as ckpt_lib
from lsdm_tpu.train.state import TrainState, create_train_state, make_optimizer
from lsdm_tpu.utils.logger import KVLogger


def _make_step_fn(
    model: SceneDiffusionModel,
    schedule,
    tx: optax.GradientTransformation,
    lambda_cat: float = 0.1,
    ema_rate: float = 0.0,
    chamfer_impl: str = "xla",
):
    """The unjitted train-step body shared by the per-batch program
    (``make_train_step``) and the scanned multi-batch program
    (``make_scan_train_step``)."""

    def step(state: TrainState, mask, objs, cats, target, target_cat, text_emb, key):
        B = target.shape[0]
        t_key, noise_key, drop_key = jax.random.split(key, 3)
        t = jax.random.randint(t_key, (B,), 0, schedule.num_timesteps)
        noise = jax.random.normal(noise_key, target.shape, jnp.float32)

        def loss_fn(params):
            mutated = {}

            def model_fn(x_t, tt):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x_t, mask, tt, objs, cats, text_emb, True,
                    mutable=["batch_stats"],
                    rngs={"dropout": drop_key},
                )
                mutated["batch_stats"] = mut["batch_stats"]
                return out

            terms = training_losses(
                schedule, model_fn, target, t, target_cat, noise,
                lambda_cat=lambda_cat, chamfer_impl=chamfer_impl,
            )
            return terms["loss"], (terms, mutated["batch_stats"])

        (loss, (terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_ema = state.ema_params
        if ema_rate > 0 and state.ema_params is not None:
            from lsdm_tpu.train.state import update_ema

            new_ema = update_ema(state.ema_params, new_params, ema_rate)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = {
            "loss": loss,
            "mse": terms["mse"],
            "cat_loss": terms["cat_loss"],
            "grad_norm": gnorm,
        }
        return new_state, metrics

    return step


def make_train_step(
    model: SceneDiffusionModel,
    schedule,
    tx: optax.GradientTransformation,
    lambda_cat: float = 0.1,
    ema_rate: float = 0.0,
    chamfer_impl: str = "xla",
):
    """Returns jitted ``step(state, batch_arrays, text_emb, key) ->
    (state, metrics)``.  ``state`` is donated.  ``ema_rate > 0`` maintains
    an exponential moving average of the parameters (reference
    ``update_ema``, ``diffusion/nn.py:56``)."""
    step = _make_step_fn(model, schedule, tx, lambda_cat, ema_rate, chamfer_impl)
    return jax.jit(step, donate_argnums=0)


def make_scan_train_step(
    model: SceneDiffusionModel,
    schedule,
    tx: optax.GradientTransformation,
    lambda_cat: float = 0.1,
    ema_rate: float = 0.0,
    chamfer_impl: str = "xla",
):
    """Returns jitted ``scan_step(state, stacked_arrays..., epoch_key,
    step_idx) -> (state, stacked_metrics)``: ``lax.scan`` of the train step
    over a leading chunk axis, one device dispatch for K optimizer steps.

    On the tunneled axon chip each dispatch costs ~28 ms of transport
    (PERF.md); every measured training row amortizes it 20x inside one
    program (``tools/bench_train.py --chunk``).  This is that program for
    the production ``Trainer``: batch arrays carry a leading ``K`` axis,
    per-step RNG keys are derived INSIDE the program
    (``fold_in(epoch_key, step_idx[k])`` — bit-identical to the per-batch
    path's host-side fold), and the carried ``TrainState`` is donated.
    """
    step = _make_step_fn(model, schedule, tx, lambda_cat, ema_rate, chamfer_impl)

    def scan_step(state: TrainState, mask, objs, cats, target, target_cat,
                  text_emb, base_key, step_idx):
        def body(st, xs):
            m, o, c, tg, tc, te, idx = xs
            k = jax.random.fold_in(base_key, idx)
            return step(st, m, o, c, tg, tc, te, k)

        xs = (mask, objs, cats, target, target_cat, text_emb, step_idx)
        return jax.lax.scan(body, state, xs)

    return jax.jit(scan_step, donate_argnums=0)


def make_eval_step(model: SceneDiffusionModel, schedule, clip_denoised: bool = False):
    """Returns jitted ``eval_step(state, batch_arrays, text_emb, key) ->
    (sample, chamfer, cat_probs, guiding)``: full scanned sampling + metrics,
    mirroring the reference validation (``run/train_sdm.py:110-183``) and
    test (``run/test_sdm.py:146-208``) protocol."""

    def eval_step(state: TrainState, mask, objs, cats, target, text_emb, key):
        from lsdm_tpu.models.sampling import sample_sdm

        sample, last_out = sample_sdm(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            schedule, mask, objs, cats, text_emb, key,
            clip_denoised=clip_denoised,
        )
        cfd = chamfer_distance(sample, target)
        return sample, cfd, last_out.cat, last_out.guiding

    return jax.jit(eval_step)


class Trainer:
    """Epoch loop with validation + best-checkpoint tracking
    (reference ``run/train_sdm.py:186-337``)."""

    def __init__(
        self,
        model_cfg: SDMConfig,
        diff_cfg: DiffusionConfig = DiffusionConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        text_encoder=None,
        mesh=None,
        save_dir: str = "training_output",
    ):
        self.model_cfg = model_cfg
        self.diff_cfg = diff_cfg
        self.train_cfg = train_cfg
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.mesh = mesh

        obj_shard = mesh_lib.obj_sharding(mesh) if mesh is not None else None
        self.model = SceneDiffusionModel(model_cfg, obj_sharding=obj_shard)
        self.schedule = make_schedule(diff_cfg.noise_schedule, diff_cfg.steps)
        self.tx = make_optimizer(
            train_cfg.lr, train_cfg.weight_decay,
            getattr(train_cfg, "lr_anneal_steps", 0),
        )
        if text_encoder is None:
            from lsdm_tpu.models.text import TextEncoder

            text_encoder = TextEncoder("HASH", dim=model_cfg.clip_dim)
        self.text_encoder = text_encoder
        self.logger = KVLogger(os.path.join(save_dir, "logs"))
        self._train_step = make_train_step(
            self.model, self.schedule, self.tx, diff_cfg.lambda_cat,
            ema_rate=getattr(train_cfg, "ema_rate", 0.0),
        )
        self.steps_per_dispatch = max(
            1, int(getattr(train_cfg, "steps_per_dispatch", 1))
        )
        self._scan_step = (
            make_scan_train_step(
                self.model, self.schedule, self.tx, diff_cfg.lambda_cat,
                ema_rate=getattr(train_cfg, "ema_rate", 0.0),
            )
            if self.steps_per_dispatch > 1
            else None
        )
        self._eval_step = make_eval_step(self.model, self.schedule)
        self.state: Optional[TrainState] = None

    def init_state(self, sample_batch: Batch, seed: int = 0) -> TrainState:
        b = sample_batch
        text_emb = self.text_encoder.encode(b.text)
        variables = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.asarray(b.target_verts),
            jnp.asarray(b.mask),
            jnp.zeros((b.mask.shape[0],), jnp.int32),
            jnp.asarray(b.given_objs),
            jnp.asarray(b.given_cats),
            jnp.asarray(text_emb),
        )
        self.state = create_train_state(
            variables, self.tx, ema=getattr(self.train_cfg, "ema_rate", 0.0) > 0
        )
        return self.state

    # step/scan_step argument order — the single source of the Batch ->
    # array mapping shared by the per-batch and chunked paths
    _BATCH_FIELDS = ("mask", "given_objs", "given_cats", "target_verts",
                     "target_cat")

    def _host_arrays(self, b: Batch):
        return tuple(np.asarray(getattr(b, f)) for f in self._BATCH_FIELDS) + (
            np.asarray(self.text_encoder.encode(b.text)),
        )

    def _device_batch(self, b: Batch):
        arrays = self._host_arrays(b)
        if self.mesh is not None:
            return tuple(
                jax.device_put(a, mesh_lib.batch_sharding(self.mesh, a.ndim))
                for a in arrays
            )
        return tuple(jnp.asarray(a) for a in arrays)

    def _device_chunk(self, batches):
        """Stack K host batches on a leading chunk axis for the scanned
        multi-step program (one device_put + one dispatch per K steps).
        Host arrays go straight to their target sharding — no staging
        commit on the default device."""
        per = [self._host_arrays(b) for b in batches]
        stacked = tuple(np.stack(xs) for xs in zip(*per))
        if self.mesh is not None:
            return tuple(
                jax.device_put(
                    a, mesh_lib.stacked_batch_sharding(self.mesh, a.ndim)
                )
                for a in stacked
            )
        return tuple(jnp.asarray(a) for a in stacked)

    def train_epoch(self, loader: DataLoader, epoch: int, key) -> Dict[str, float]:
        assert self.state is not None, "call init_state first"
        # metrics stay ON DEVICE until epoch end: a float() per step is a
        # host sync that blocks async dispatch — the device sits idle
        # behind the per-dispatch latency (~28 ms on the tunneled axon)
        # between every step. One device_get at the end fetches them all.
        step_metrics = []
        K = self.steps_per_dispatch
        # fold_in values consumed this epoch, both paths.  The chunked and
        # per-batch programs must draw IDENTICAL per-step keys for the same
        # loader order (the bit-identical claim test_chunked_trainer relies
        # on); asserted below so a refactor that reorders the pending flush
        # cannot silently diverge them (advisor r4).
        consumed_folds = []

        def one_step(i, batch):
            mask, objs, cats, target, target_cat, text_emb = self._device_batch(batch)
            consumed_folds.append(epoch * 100003 + i)
            step_key = jax.random.fold_in(key, epoch * 100003 + i)
            self.state, metrics = self._train_step(
                self.state, mask, objs, cats, target, target_cat, text_emb, step_key
            )
            step_metrics.append(metrics)

        pending = []  # (global step index, Batch) awaiting a full chunk
        for i, batch in enumerate(loader):
            if K <= 1:
                one_step(i, batch)
                continue
            pending.append((i, batch))
            if len(pending) == K:
                idxs = np.asarray(
                    [epoch * 100003 + j for j, _ in pending], np.uint32
                )
                consumed_folds.extend(int(v) for v in idxs)
                arrays = self._device_chunk([b for _, b in pending])
                self.state, metrics = self._scan_step(
                    self.state, *arrays, key, jnp.asarray(idxs)
                )
                step_metrics.append(metrics)  # (K,) leaves
                pending = []
        # leftover (< K) batches run through the per-batch program — exact
        # same update semantics, just without the dispatch amortization
        for i, batch in pending:
            one_step(i, batch)
        base = epoch * 100003
        assert consumed_folds == [base + j for j in range(len(consumed_folds))], (
            "chunked/per-batch fold_in sequences diverged from the "
            "enumerate order"
        )
        fetched = jax.device_get(step_metrics)
        count = 0
        totals: Dict[str, float] = {}
        for metrics in fetched:
            count += int(np.asarray(next(iter(metrics.values()))).size)
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(np.sum(v))
        means = {k: v / max(count, 1) for k, v in totals.items()}
        for k, v in means.items():
            self.logger.log(f"train/{k}", v, step=epoch)
        return means

    def validate(self, loader: DataLoader, epoch: int, key) -> Dict[str, float]:
        """Full sampling validation: chamfer + category accuracy
        (reference ``run/train_sdm.py:110-183``)."""
        assert self.state is not None
        cfds, accs, top3s = [], [], []
        for i, batch in enumerate(loader):
            mask, objs, cats, target, target_cat, text_emb = self._device_batch(batch)
            k = jax.random.fold_in(key, i)
            sample, cfd, cat_probs, _ = self._eval_step(
                self.state, mask, objs, cats, target, text_emb, k
            )
            cfds.append(float(cfd))
            tgt = jnp.argmax(target_cat, axis=1)
            probs = cat_probs[:, 0, :]
            (top1,) = topk_accuracy(probs, tgt, (1,))
            (top3,) = topk_accuracy(probs, tgt, (3,))
            accs.append(float(top1))
            top3s.append(float(top3))
        out = {
            "cfd": float(np.mean(cfds)),
            "acc": float(np.mean(accs)),
            "top3_acc": float(np.mean(top3s)),
        }
        for k, v in out.items():
            self.logger.log(f"valid/{k}", v, step=epoch)
        return out

    def fit(
        self,
        train_loader: DataLoader,
        valid_loader: Optional[DataLoader] = None,
        epochs: Optional[int] = None,
        seed: int = 0,
    ):
        """Train with best-by-valid-loss / best-by-CFD checkpointing
        (reference ``run/train_sdm.py:294-337``)."""
        cfg = self.train_cfg
        epochs = epochs if epochs is not None else cfg.epochs
        key = jax.random.PRNGKey(seed)
        if self.state is None:
            self.init_state(next(iter(train_loader)), seed)
        best_train = float("inf")
        best_cfd = float("inf")
        for epoch in range(epochs):
            t0 = time.time()
            means = self.train_epoch(train_loader, epoch, key)
            dt = time.time() - t0
            self.logger.log("train/epoch_seconds", dt, step=epoch)
            if means["loss"] < best_train:
                best_train = means["loss"]
                ckpt_lib.save(
                    os.path.join(self.save_dir, "best_model_train_loss.ckpt"),
                    self.state, extra={"epoch": epoch, "train_loss": means["loss"]},
                )
            if valid_loader is not None and (epoch + 1) % cfg.eval_every == 0:
                val = self.validate(
                    valid_loader, epoch, jax.random.fold_in(key, 0x7FFFFFFF - epoch)
                )
                if val["cfd"] < best_cfd:
                    best_cfd = val["cfd"]
                    ckpt_lib.save(
                        os.path.join(self.save_dir, "best_model_cfd.ckpt"),
                        self.state, extra={"epoch": epoch, "cfd": val["cfd"]},
                    )
                ckpt_lib.save(
                    os.path.join(self.save_dir, f"epoch_{epoch:04d}.ckpt"),
                    self.state, extra={"epoch": epoch},
                )
        ckpt_lib.save(
            os.path.join(self.save_dir, "final.ckpt"), self.state,
            extra={"epoch": epochs - 1},
        )
        return self.state
