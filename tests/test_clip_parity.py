"""CLIP text-tower numeric parity vs torch `transformers` oracle, and
SimpleTokenizer BPE parity vs HF CLIPTokenizer.

The reference encodes prompts with the OpenAI CLIP ViT-B/32 text tower
(``model/sdm.py:245-277``).  No pretrained weights are downloadable in this
environment, so parity is proven structurally: a random-weight
``CLIPTextModelWithProjection`` (same arch, QuickGELU, EOT pooling) is
converted with :func:`convert_clip_text` and must match our flax tower to
float32 tolerance.  Given converted *released* weights, the same code path
reproduces the reference's prompt embeddings.
"""

import gzip
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lsdm_tpu.models.text import CLIPTextTransformer, SimpleTokenizer, tokenize_batch
from lsdm_tpu.train.checkpoint import convert_clip_text


@pytest.fixture(autouse=True)
def _high_precision():
    with jax.default_matmul_precision("highest"):
        yield


def _tiny_hf_model(vocab=512, width=64, heads=4, layers=3, embed=32, ctx=16):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=vocab,
        hidden_size=width,
        intermediate_size=width * 4,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        max_position_embeddings=ctx,
        projection_dim=embed,
        hidden_act="quick_gelu",
        # EOT = highest token id, the OpenAI convention our tower pools on
        eos_token_id=vocab - 1,
        bos_token_id=vocab - 2,
    )
    torch.manual_seed(0)
    return CLIPTextModelWithProjection(cfg).eval()


def _tokens(vocab, ctx, B=3, seed=1):
    """Token rows in the reference scheme: [SOT] body [EOT] zero-pad, with
    EOT = vocab-1 (the unique argmax, so both pooling rules agree)."""
    rng = np.random.RandomState(seed)
    toks = np.zeros((B, ctx), np.int64)
    for i in range(B):
        n = rng.randint(2, ctx - 2)
        toks[i, 0] = vocab - 2
        toks[i, 1 : 1 + n] = rng.randint(1, vocab - 2, n)
        toks[i, 1 + n] = vocab - 1
    return toks


def test_clip_tower_parity_vs_hf():
    vocab, width, heads, layers, embed, ctx = 512, 64, 4, 3, 32, 16
    hf = _tiny_hf_model(vocab, width, heads, layers, embed, ctx)
    toks = _tokens(vocab, ctx)

    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(toks)).text_embeds.numpy()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text(sd)

    ours = CLIPTextTransformer(
        vocab_size=vocab, context_length=ctx, width=width, heads=heads,
        layers=layers, embed_dim=embed,
    )
    # converted tree must exactly match the init tree's structure
    ref_tree = ours.init(jax.random.PRNGKey(0), jnp.asarray(toks, jnp.int32))[
        "params"
    ]
    ref_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(ref_tree)
    }
    got_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(params)
    }
    assert got_paths == ref_paths, (
        f"missing: {ref_paths - got_paths}\nextra: {got_paths - ref_paths}"
    )

    got = ours.apply({"params": params}, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_clip_converter_openai_naming():
    """The OpenAI `clip` naming (what SDM checkpoints embed under
    ``clip_model.``) converts to the identical param tree as HF naming."""
    vocab, width, heads, layers, embed, ctx = 128, 32, 4, 2, 16, 8
    hf = _tiny_hf_model(vocab, width, heads, layers, embed, ctx)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params_hf = convert_clip_text(sd)

    # rebuild the same weights under OpenAI naming (+ clip_model. prefix)
    oa = {}
    oa["clip_model.token_embedding.weight"] = sd[
        "text_model.embeddings.token_embedding.weight"
    ]
    oa["clip_model.positional_embedding"] = sd[
        "text_model.embeddings.position_embedding.weight"
    ]
    oa["clip_model.text_projection"] = sd["text_projection.weight"].T
    oa["clip_model.ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    oa["clip_model.ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    oa["clip_model.logit_scale"] = np.zeros(())  # ignored
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        q = f"clip_model.transformer.resblocks.{i}"
        oa[f"{q}.ln_1.weight"] = sd[f"{p}.layer_norm1.weight"]
        oa[f"{q}.ln_1.bias"] = sd[f"{p}.layer_norm1.bias"]
        oa[f"{q}.ln_2.weight"] = sd[f"{p}.layer_norm2.weight"]
        oa[f"{q}.ln_2.bias"] = sd[f"{p}.layer_norm2.bias"]
        oa[f"{q}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{p}.self_attn.{x}_proj.weight"] for x in "qkv"], 0
        )
        oa[f"{q}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{p}.self_attn.{x}_proj.bias"] for x in "qkv"], 0
        )
        oa[f"{q}.attn.out_proj.weight"] = sd[f"{p}.self_attn.out_proj.weight"]
        oa[f"{q}.attn.out_proj.bias"] = sd[f"{p}.self_attn.out_proj.bias"]
        oa[f"{q}.mlp.c_fc.weight"] = sd[f"{p}.mlp.fc1.weight"]
        oa[f"{q}.mlp.c_fc.bias"] = sd[f"{p}.mlp.fc1.bias"]
        oa[f"{q}.mlp.c_proj.weight"] = sd[f"{p}.mlp.fc2.weight"]
        oa[f"{q}.mlp.c_proj.bias"] = sd[f"{p}.mlp.fc2.bias"]
    params_oa = convert_clip_text(oa)

    flat_hf = jax.tree_util.tree_leaves_with_path(params_hf)
    flat_oa = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params_oa)
    )
    assert len(flat_hf) == len(flat_oa)
    for p, v in flat_hf:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_oa[jax.tree_util.keystr(p)])
        )


# ---------------------------------------------------------------------------
# tokenizer algorithm parity on a synthetic merges file


def _synthetic_bpe(tmp_path):
    """Build a small CLIP-scheme BPE (byte alphabet + </w> + merges) and
    write both our gzipped merges file and HF's vocab.json/merges.txt."""
    from lsdm_tpu.models.text import bytes_to_unicode

    merges = [
        ("t", "h"), ("th", "e</w>"), ("a</w>", ""), ("c", "h"),
        ("ch", "a"), ("i", "r</w>"), ("cha", "ir</w>"), ("t", "a"),
        ("b", "l"), ("ta", "bl"), ("tabl", "e</w>"), ("o", "n</w>"),
        ("p", "l"), ("a", "c"), ("pl", "ac"), ("plac", "e</w>"),
    ]
    merges = [m for m in merges if m[1]]  # drop the filler
    byte_enc = bytes_to_unicode()
    vocab = list(byte_enc.values())
    vocab = vocab + [v + "</w>" for v in vocab]
    for m in merges:
        vocab.append("".join(m))
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])

    merges_gz = tmp_path / "bpe_merges.txt.gz"
    with gzip.open(merges_gz, "wb") as f:
        lines = ["#version: synthetic"] + [" ".join(m) for m in merges]
        f.write(("\n".join(lines) + "\n").encode())

    vocab_json = tmp_path / "vocab.json"
    vocab_json.write_text(json.dumps({w: i for i, w in enumerate(vocab)}))
    merges_txt = tmp_path / "merges.txt"
    merges_txt.write_text(
        "#version: synthetic\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    )
    return merges_gz, vocab_json, merges_txt


def test_simple_tokenizer_matches_hf(tmp_path):
    from transformers import CLIPTokenizer

    merges_gz, vocab_json, merges_txt = _synthetic_bpe(tmp_path)
    ours = SimpleTokenizer(str(merges_gz))
    hf = CLIPTokenizer(str(vocab_json), str(merges_txt))

    prompts = [
        "place the chair on the table",
        "THE TABLE",          # lowercasing
        "chairs, tables!",    # punctuation split + unmerged words
        "place   the    chair",  # whitespace cleanup
    ]
    for p in prompts:
        got = ours.encode(p)
        expected = hf(p, add_special_tokens=False)["input_ids"]
        assert got == expected, f"{p!r}: {got} != {expected}"
    # specials line up with HF's convention (vocab order)
    assert ours.sot == hf.convert_tokens_to_ids("<|startoftext|>")
    assert ours.eot == hf.convert_tokens_to_ids("<|endoftext|>")


def test_tokenize_batch_pad_scheme_with_bpe(tmp_path):
    """Reference pad scheme (model/sdm.py:248-255) on the real BPE code:
    [SOT] + tokens truncated to 20 + [EOT], zero-padded to 77."""
    merges_gz, _, _ = _synthetic_bpe(tmp_path)
    tok = SimpleTokenizer(str(merges_gz))
    out = tokenize_batch(tok, ["place the chair", " ".join(["table"] * 40)])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    body = tok.encode("place the chair")
    assert list(out[0, 1 : 1 + len(body)]) == body
    assert out[0, 1 + len(body)] == tok.eot
    assert (out[0, 2 + len(body) :] == 0).all()
    # truncation: 20 body tokens max, EOT at index 21
    assert out[1, 21] == tok.eot
    assert (out[1, 22:] == 0).all()


# ---------------------------------------------------------------------------
# BPE asset resolution + parity-eval guards (VERDICT r02 item 2)


def test_simple_tokenizer_reads_hf_merges_txt(tmp_path):
    """An HF merges.txt is the same merges list as the OpenAI gz; both
    sources must tokenize identically."""
    merges_gz, _, merges_txt = _synthetic_bpe(tmp_path)
    a = SimpleTokenizer(str(merges_gz))
    b = SimpleTokenizer(str(merges_txt))
    for p in ["place the chair on the table", "chairs, tables!"]:
        assert a.encode(p) == b.encode(p)
    assert a.sot == b.sot and a.eot == b.eot


def test_resolve_clip_bpe_sources(tmp_path, monkeypatch):
    from lsdm_tpu.models import text as text_lib

    monkeypatch.delenv("LSDM_TPU_CLIP_BPE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty_hf"))
    monkeypatch.setattr(text_lib, "CLIP_BPE_ASSET",
                        str(tmp_path / "no_asset.gz"))
    assert text_lib.resolve_clip_bpe(None) is None

    merges_gz, _, merges_txt = _synthetic_bpe(tmp_path)
    # explicit file wins
    assert text_lib.resolve_clip_bpe(str(merges_gz)) == str(merges_gz)
    # a directory containing merges.txt resolves to it
    assert text_lib.resolve_clip_bpe(str(tmp_path)) == str(merges_txt)
    # env var
    monkeypatch.setenv("LSDM_TPU_CLIP_BPE", str(merges_gz))
    assert text_lib.resolve_clip_bpe(None) == str(merges_gz)
    monkeypatch.delenv("LSDM_TPU_CLIP_BPE")
    # HF hub cache layout: <HF_HOME>/hub/models--*clip*/snapshots/x/merges.txt
    snap = (tmp_path / "hf" / "hub" / "models--openai--clip-vit-base-patch32"
            / "snapshots" / "abc")
    snap.mkdir(parents=True)
    (snap / "merges.txt").write_text(merges_txt.read_text())
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    found = text_lib.resolve_clip_bpe(None)
    assert found is not None and found.endswith("merges.txt")


def test_text_encoder_parity_guard(tmp_path, monkeypatch):
    """require_parity refuses to silently substitute the hash tokenizer."""
    import pytest

    from lsdm_tpu.models import text as text_lib

    monkeypatch.delenv("LSDM_TPU_CLIP_BPE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty_hf"))
    monkeypatch.setattr(text_lib, "CLIP_BPE_ASSET",
                        str(tmp_path / "no_asset.gz"))
    with pytest.raises(RuntimeError, match="BPE merges"):
        text_lib.TextEncoder("CLIP", dim=16, require_parity=True)
    # non-strict path still works (flagged fallback)
    with pytest.warns(UserWarning, match="hash tokenizer"):
        enc = text_lib.TextEncoder("CLIP", dim=16)
    assert enc.encode(["a chair"]).shape == (1, 16)


def test_resolve_parity_flags_auto():
    """Loading a reference .pt defaults the graph to resnet18 + the
    batch-axis quirk; explicit flags win; our .ckpt stays plain."""
    from argparse import Namespace

    from lsdm_tpu.run._baseline_common import resolve_parity_flags

    a = Namespace(load_model="m.pt", feature_extractor=None,
                  torch_seq_axis_quirk=None)
    resolve_parity_flags(a)
    assert a.feature_extractor == "resnet18"
    assert a.torch_seq_axis_quirk is True

    b = Namespace(load_model="m.pt", feature_extractor="simple",
                  torch_seq_axis_quirk=False)
    resolve_parity_flags(b)
    assert b.feature_extractor == "simple"
    assert b.torch_seq_axis_quirk is False

    c = Namespace(load_model="m.ckpt", feature_extractor=None,
                  torch_seq_axis_quirk=None)
    resolve_parity_flags(c)
    assert c.feature_extractor == "simple"
    assert c.torch_seq_axis_quirk is False


def test_vendored_asset_matches_hf(tmp_path, monkeypatch):
    """End-to-end through the VENDORED asset (VERDICT r03 item 5): vendor
    the merges from a fake HF cache with tools/vendor_clip_bpe's library
    entry point, then tokenize via the resolution chain with NO explicit
    flags and match HF's CLIPTokenizer on the same table."""
    from transformers import CLIPTokenizer

    from lsdm_tpu.models import text as text_lib

    _, vocab_json, merges_txt = _synthetic_bpe(tmp_path)
    # fake HF cache holding the only copy
    snap = (tmp_path / "hf" / "hub" / "models--openai--clip-vit-base-patch32"
            / "snapshots" / "abc")
    snap.mkdir(parents=True)
    (snap / "merges.txt").write_text(merges_txt.read_text())
    monkeypatch.delenv("LSDM_TPU_CLIP_BPE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    dest = tmp_path / "assets" / "bpe_simple_vocab_16e6.txt.gz"
    monkeypatch.setattr(text_lib, "CLIP_BPE_ASSET", str(dest))

    info = text_lib.vendor_clip_bpe(force=True)  # finds the HF copy itself
    assert info["source"].endswith("merges.txt")
    # the cache is now irrelevant: the asset wins the chain
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty_hf"))
    enc = text_lib.TextEncoder("CLIP", dim=16, require_parity=True)
    assert isinstance(enc.tokenizer, text_lib.SimpleTokenizer)

    hf = CLIPTokenizer(str(vocab_json), str(merges_txt))
    for p in ["place the chair on the table", "chairs, tables!"]:
        assert enc.tokenizer.encode(p) == hf(
            p, add_special_tokens=False)["input_ids"]
