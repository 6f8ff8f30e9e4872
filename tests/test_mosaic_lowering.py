"""TPU (Mosaic) lowering of every Pallas kernel, verified WITHOUT a TPU.

``jax.export(platforms=["tpu"])`` runs the real Mosaic pipeline on any
host, so interpret-mode equivalence tests plus this lowering pin give
full no-device coverage of the kernels.  Round 3 caught three genuine
TPU-only bugs this way (erfc-unimplemented, two illegal block tilings)
— see ``tools/verify_mosaic.py``, which this test drives.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # ~2-3 min of Mosaic lowering

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("family",
                         ["attn", "attn_train", "ballquery", "chamfer",
                          "denoise", "fp", "fps", "sa", "sg"])
def test_mosaic_lowering(family):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_mosaic.py"),
         "--only", family],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"{family}:\n{r.stdout}\n{r.stderr}"


def test_i1_vector_lint_flags_prefix_sa_pattern():
    """Retroactive pin for the round-3 false negative (VERDICT r03 item 4).

    ``jax.export``'s Mosaic pipeline ACCEPTED the pre-6b38000
    ``sa_fused_pallas`` one-hot build (a select between two bool vectors)
    that the real libtpu AOT compiler rejected with "Unsupported target
    bitwidth for truncation".  ``verify_mosaic.lint_i1_vectors`` must flag
    exactly that pattern — reproduced here as a minimal kernel — while
    passing the shipped (f32 one-hot) formulation.
    """
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import export
    from jax.experimental import pallas as pl

    from verify_mosaic import lint_i1_vectors

    def prefix_style(x_ref, o_ref):  # pre-fix: bool-vector select
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        cand = jnp.where(x_ref[...] > 0, iota, 128)
        first = jnp.min(cand, axis=-1, keepdims=True)
        oh = jnp.where(first == 128, iota == 0, cand == first)
        o_ref[...] = oh.astype(jnp.float32)

    def fixed_style(x_ref, o_ref):  # shipped: one-hots built as f32
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        cand = jnp.where(x_ref[...] > 0, iota, 128)
        first = jnp.min(cand, axis=-1, keepdims=True)
        oh = jnp.where(first == 128, (iota == 0).astype(jnp.float32),
                       (cand == first).astype(jnp.float32))
        o_ref[...] = oh

    def export_text(kern):
        f = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
        return export.export(jax.jit(f), platforms=["tpu"])(
            jnp.ones((8, 128))).mlir_module()

    bad = lint_i1_vectors(export_text(prefix_style))
    assert bad and any("select" in line for line in bad), bad
    assert lint_i1_vectors(export_text(fixed_style)) == []


def test_shape_cast_lint_flags_unit_middle_expansion():
    """Retroactive pin for the round-4 false negative (bt_sg.log).

    The pre-fix ``sg_fused_pallas`` assembled the grouped tensor with
    ``g[:, None, :]`` — a rank-2 -> rank-3 unit-MIDDLE-dim
    ``vector.shape_cast`` that ``jax.export`` accepts but libtpu's AOT
    compiler rejects ("infer-vector-layout: unsupported shape cast",
    two burned TPU queue slots).  ``lint_tiled_shape_casts`` must flag
    that pattern while passing the shipped formulation (K-major
    leading-dim stores, whose leading-unit-dim casts keep the tiled
    dims intact).
    """
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import export
    from jax.experimental import pallas as pl

    from verify_mosaic import lint_tiled_shape_casts

    def prefix_style(x_ref, o_ref):  # pre-fix: mid-dim expansion concat
        cols = [x_ref[0][:, None, :] * (k + 1.0) for k in range(4)]
        o_ref[0] = jnp.concatenate(cols, axis=1)

    def fixed_style(x_ref, o_ref):  # shipped: K-major per-slot stores
        for k in range(4):
            o_ref[0, k] = x_ref[0] * (k + 1.0)

    x = jnp.ones((1, 8, 128))

    def export_text(kern, oshape):
        f = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32))
        return export.export(jax.jit(f), platforms=["tpu"])(x).mlir_module()

    bad = lint_tiled_shape_casts(export_text(prefix_style, (1, 8, 4, 128)))
    assert bad and any("shape_cast" in line for line in bad), bad
    assert lint_tiled_shape_casts(
        export_text(fixed_style, (1, 4, 8, 128))) == []
