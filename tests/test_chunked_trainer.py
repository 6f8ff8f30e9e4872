"""Chunked-dispatch training (steps_per_dispatch > 1).

The production ``Trainer`` can scan K optimizer steps in one compiled,
donated program (``make_scan_train_step``) — the same dispatch
amortization every PERF.md training row uses (``bench_train --chunk``).
These tests pin that the chunked path is a pure performance mode: the
parameter trajectory matches the per-batch path (same fold_in key
derivation, same update math), including when the epoch length leaves a
remainder chunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# two full SDM train-step compiles each — quick-gate budget says slow
pytestmark = pytest.mark.slow

from lsdm_tpu.config import DiffusionConfig, SDMConfig, TrainConfig
from lsdm_tpu.diffusion import make_schedule
from lsdm_tpu.models.sdm import SceneDiffusionModel
from lsdm_tpu.train.state import create_train_state, make_optimizer
from lsdm_tpu.train.trainer import (
    Trainer,
    make_scan_train_step,
    make_train_step,
)

TINY = SDMConfig(clip_dim=32, latent_dim=16, cat_emb=8, n_head=4,
                 vert_dims=24, pcd_points=32)


def _tiny_batch(key, B=2, O=9, N=32):
    ks = jax.random.split(key, 5)
    mask = jnp.zeros((B, O)).at[:, 1:4].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3)) * 0.3
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (B, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (B, TINY.clip_dim))
    target = jax.random.normal(ks[0], (B, N, 3)) * 0.2 + 0.3
    target_cat = jax.nn.one_hot(jnp.array([2, 5]), 13)
    return mask, objs, cats, target, target_cat, text


def test_scan_step_matches_per_step():
    """K scanned steps == K individual jitted steps (same keys, batches)."""
    K = 3
    model = SceneDiffusionModel(TINY)
    schedule = make_schedule("cosine", 16)
    tx = make_optimizer(lr=3e-3)
    batches = [_tiny_batch(jax.random.PRNGKey(10 + i)) for i in range(K)]
    m0, o0, c0, tg0, tc0, te0 = batches[0]
    variables = model.init(jax.random.PRNGKey(0), tg0, m0,
                           jnp.zeros((tg0.shape[0],), jnp.int32), o0, c0, te0)
    base_key = jax.random.PRNGKey(7)
    idxs = np.arange(K, dtype=np.uint32) * 11 + 5  # arbitrary step indices

    # the donated per-batch path consumes its state's buffers — give each
    # path its own copy of the init variables
    variables2 = jax.tree.map(lambda x: jnp.array(x), variables)

    # per-batch path
    step = make_train_step(model, schedule, tx)
    state = create_train_state(variables, tx)
    per_metrics = []
    for i in range(K):
        k = jax.random.fold_in(base_key, int(idxs[i]))
        state, metrics = step(state, *batches[i], k)
        per_metrics.append(metrics)

    # chunked path (fresh state from the same variables)
    scan_step = make_scan_train_step(model, schedule, tx)
    state2 = create_train_state(variables2, tx)
    stacked = tuple(jnp.stack(xs) for xs in zip(*batches))
    state2, scan_metrics = scan_step(state2, *stacked, base_key,
                                     jnp.asarray(idxs))

    assert int(state2.step) == int(state.step) == K
    flat1 = jax.tree.leaves(state.params)
    flat2 = jax.tree.leaves(state2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for i in range(K):
        np.testing.assert_allclose(float(scan_metrics["loss"][i]),
                                   float(per_metrics[i]["loss"]), rtol=1e-5)


def test_trainer_chunked_equals_per_step(tmp_path):
    """Full Trainer: steps_per_dispatch=2 over 5 batches (2 chunks + a
    remainder through the per-batch program) matches steps_per_dispatch=1
    — same final params, same epoch metrics."""
    from lsdm_tpu.data.dataset import DataLoader, ProxDatasetTxt
    from lsdm_tpu.data.synthetic import generate

    root = str(tmp_path)
    generate(root, "proxd", n_scenes=1, n_seqs=5, pnt_size=32, seed=0)

    def run(k_per_dispatch):
        ds = ProxDatasetTxt(f"{root}/proxd_train", max_cats=TINY.max_cats,
                            pnt_size=32, objs_data_dir=f"{root}/objs")
        loader = DataLoader(ds, 1, shuffle=True, seed=0, drop_last=True)
        tr = Trainer(
            TINY, DiffusionConfig(steps=8),
            TrainConfig(batch_size=1, lr=3e-3, epochs=1,
                        steps_per_dispatch=k_per_dispatch),
            save_dir=str(tmp_path / f"out_{k_per_dispatch}"),
        )
        tr.init_state(next(iter(loader)), seed=0)
        means = tr.train_epoch(loader, 0, jax.random.PRNGKey(3))
        return tr.state, means

    state1, means1 = run(1)
    state2, means2 = run(2)
    assert int(state1.step) == int(state2.step) == 5
    # Tolerances: the scanned grad program is a different XLA compilation
    # than the per-step one — its arithmetic is reassociated, so losses
    # agree only to ~1e-7 relative, and AdamW's g/sqrt(v) normalization
    # amplifies eps-noise on near-zero-grad elements into O(lr*steps)
    # parameter drift (measured ~2e-2 max-abs here at lr=3e-3 x 5 steps).
    # A *plumbing* bug (wrong key index, batch order, remainder handling)
    # changes the loss trajectory at the first wrong step by O(1) — which
    # is what this test pins; the tight math pin is
    # test_scan_step_matches_per_step above.
    lr, steps = 3e-3, 5
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4 * lr * steps, rtol=0)
    for k in means1:
        np.testing.assert_allclose(means1[k], means2[k], rtol=1e-3,
                                   err_msg=k)
