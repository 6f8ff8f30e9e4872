"""ATISS baseline training sanity: the MSE+CE objective overfits one batch."""

import jax

import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp
import numpy as np
import optax

from lsdm_tpu.models.atiss import AutoregressiveTransformer

C = 10


def test_atiss_overfits_single_batch(rng):
    model = AutoregressiveTransformer(n_classes=C, n_layers=2, dim_ff=64,
                                      hidden_dims=64)
    B, L = 4, 5
    boxes = {
        "class_labels": jnp.asarray(np.eye(C, dtype=np.float32)[
            rng.randint(0, C, (B, L))]),
        "translations": jnp.asarray(rng.randn(B, L, 3).astype(np.float32)),
        "sizes": jnp.asarray(rng.rand(B, L, 3).astype(np.float32)),
        "angles": jnp.asarray(rng.randn(B, L, 1).astype(np.float32)),
        "room_layout": jnp.ones((B, 1, 64, 64)),
        "class_labels_tr": jnp.ones((B, 1, C)),
        "translations_tr": jnp.ones((B, 1, 3)),
        "sizes_tr": jnp.ones((B, 1, 3)),
        "angles_tr": jnp.ones((B, 1, 1)),
    }
    gt_tr = jnp.asarray(rng.randn(B, 3).astype(np.float32))
    gt_sz = jnp.asarray(rng.rand(B, 3).astype(np.float32))
    gt_cat = jnp.asarray(rng.randint(0, C, (B,)))

    params = model.init(jax.random.PRNGKey(0), boxes)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, boxes)
            pred_sz = jnp.concatenate([out.sizes_x, out.sizes_y, out.sizes_z], -1)[:, 0]
            pred_tr = jnp.concatenate(
                [out.translations_x, out.translations_y, out.translations_z], -1
            )[:, 0]
            ce = -jnp.mean(jnp.take_along_axis(
                jax.nn.log_softmax(out.class_labels[:, 0], -1), gt_cat[:, None], 1))
            return (jnp.mean((pred_sz - gt_sz) ** 2)
                    + jnp.mean((pred_tr - gt_tr) ** 2) + ce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(120):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.3 * np.mean(losses[:5]), (
        f"{np.mean(losses[:5]):.3f} -> {np.mean(losses[-5:]):.3f}"
    )
