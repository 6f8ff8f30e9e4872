"""Multi-chip WEAK-SCALING measurement on the virtual CPU mesh
(VERDICT r4 item 6).

Correctness of the sharded train step is proven (driver
``dryrun_multichip``, full-size partitioning audits in PERF.md); this
measures EFFICIENCY: wall per global step at fixed PER-DEVICE batch as
the mesh grows, at the midsize config the partitioning pins use
(256-pt clouds, real architecture proportions —
``tests/test_parallel.py:179``).

All virtual devices share one physical core here, so ideal weak scaling
is wall_n = n * wall_1 (n x the serialized compute), and
``eff = (n * wall_1) / wall_n`` isolates the SPMD overhead: partition
bookkeeping, XLA-inserted collectives, and the composed/SPMD-clean
formulations the model switches to under ``obj_sharding``
(``select_impl="spmd"`` — the pallas/topk single-chip paths have no
partitioning rule).  ``--compare_dp`` adds a pure-dp point (batch
sharded, NO object-axis sharding) at the same device count to price
that formulation switch alone.

Each mesh point runs in a subprocess (the CPU device count is fixed at
backend init).  Orchestrator prints a markdown table for PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_single(mesh_shape, batch_per_device: int, steps: int,
               obj_shard: bool) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    n = mesh_shape[0] * mesh_shape[1]
    jax.config.update("jax_num_cpu_devices", n)

    import time

    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from lsdm_tpu.config import SDMConfig
    from lsdm_tpu.diffusion import make_schedule
    from lsdm_tpu.models.sdm import SceneDiffusionModel
    from lsdm_tpu.parallel import mesh as mesh_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer
    from lsdm_tpu.train.trainer import make_train_step

    cfg = SDMConfig(clip_dim=64, latent_dim=64, cat_emb=16, n_head=4,
                    vert_dims=128, pcd_points=256)
    mesh = mesh_lib.make_mesh(mesh_shape)
    model = SceneDiffusionModel(
        cfg,
        obj_sharding=mesh_lib.obj_sharding(mesh) if obj_shard else None)
    schedule = make_schedule("cosine", 100)
    tx = make_optimizer()

    B = batch_per_device * n
    O, N = cfg.max_objs, cfg.pcd_points
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    target = jax.random.normal(ks[0], (B, N, 3))
    mask = jnp.zeros((B, O)).at[:, 1:4].set(1.0)
    objs = jax.random.normal(ks[1], (B, O, N, 3))
    cats = jax.nn.one_hot(jax.random.randint(ks[2], (B, O), 0, 13), 13)
    text = jax.random.normal(ks[3], (B, cfg.clip_dim))
    target_cat = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 13)

    variables = model.init(jax.random.PRNGKey(1), target, mask,
                           jnp.zeros((B,), jnp.int32), objs, cats, text)
    state = jax.device_put(create_train_state(variables, tx),
                           mesh_lib.replicated(mesh))
    put = lambda a: jax.device_put(a, mesh_lib.batch_sharding(mesh, a.ndim))
    step = make_train_step(model, schedule, tx)
    args = [state, put(mask), put(objs), put(cats), put(target),
            put(target_cat), put(text), jax.random.PRNGKey(2)]

    # compile + 1 warm step outside the timed region
    state, m = step(*args)
    jax.block_until_ready(state)
    args[0] = state
    t0 = time.perf_counter()
    for i in range(steps):
        args[7] = jax.random.fold_in(jax.random.PRNGKey(2), i)
        args[0], m = step(*args)
    jax.block_until_ready(args[0])
    wall = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "mesh": f"{mesh_shape[0]}x{mesh_shape[1]}", "devices": n,
        "batch_per_device": batch_per_device, "global_batch": B,
        "obj_sharding": obj_shard, "step_ms": round(wall * 1e3, 1),
        "loss": round(float(m["loss"]), 4),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", default=None,
                    help="(internal) run one point: 'RxC[:dp]'")
    ap.add_argument("--batch_per_device", type=int, default=1)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--meshes", default="1x1,4x2,8x1")
    ap.add_argument("--compare_dp", action="store_true",
                    help="add a no-obj-sharding point at the largest mesh")
    args = ap.parse_args()

    if args.single:
        spec, _, flag = args.single.partition(":")
        r, c = (int(v) for v in spec.split("x"))
        run_single((r, c), args.batch_per_device, args.steps,
                   obj_shard=flag != "dp")
        return

    points = [m + ":obj" for m in args.meshes.split(",")]
    if args.compare_dp:
        points.append(args.meshes.split(",")[-1] + ":dp")
    rows = []
    for p in points:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", p,
             "--batch_per_device", str(args.batch_per_device),
             "--steps", str(args.steps)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
            env={**os.environ, "JAX_PLATFORMS": ""})
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode != 0 or not line:
            print(f"POINT {p} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        rows.append(json.loads(line[-1]))
        print(line[-1])

    base = next((r for r in rows if r["devices"] == 1), None)
    print("\n| mesh | global batch | obj_sharding | step ms | "
          "weak-scaling eff |")
    print("|---|---|---|---|---|")
    for r in rows:
        eff = ""
        if base and r["devices"] > 1:
            eff = f"{base['step_ms'] * r['devices'] / r['step_ms']:.2f}"
        print(f"| ({r['mesh']}) | {r['global_batch']} | "
              f"{'yes' if r['obj_sharding'] else 'no'} | {r['step_ms']} | "
              f"{eff} |")


if __name__ == "__main__":
    main()
