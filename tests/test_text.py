"""Text encoder tests: CLIP tower shapes, tokenization contract, hash/BERT
fallbacks, caching."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsdm_tpu.models.text import (
    CLIPTextTransformer,
    HashTokenizer,
    TextEncoder,
    tokenize_batch,
    bytes_to_unicode,
)


def test_bytes_to_unicode_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer()
    a = tok.encode("place a table next to the person")
    b = tok.encode("place a table next to the person")
    assert a == b
    assert all(0 <= t < 49406 for t in a)
    assert tok.sot == 49406 and tok.eot == 49407


def test_tokenize_batch_contract():
    """Reference scheme (model/sdm.py:248-255): [SOT] + <=20 tokens + [EOT],
    zero-padded to 77."""
    tok = HashTokenizer()
    out = tokenize_batch(tok, ["hello world", " ".join(["w"] * 50)])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    assert out[0, 3] == tok.eot  # sot + 2 words + eot
    assert (out[0, 4:] == 0).all()
    # long prompt truncates to context 22 (20 words + sot/eot)
    assert out[1, 21] == tok.eot
    assert (out[1, 22:] == 0).all()


def test_clip_tower_shapes():
    model = CLIPTextTransformer(vocab_size=128, width=32, heads=4, layers=2,
                                embed_dim=16, context_length=16)
    toks = jnp.asarray(np.random.RandomState(0).randint(1, 127, (3, 16)))
    params = model.init(jax.random.PRNGKey(0), toks)["params"]
    out = model.apply({"params": params}, toks)
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_eot_pooling_position_matters():
    """The pooled feature comes from the argmax (EOT) token position."""
    model = CLIPTextTransformer(vocab_size=128, width=32, heads=4, layers=1,
                                embed_dim=16, context_length=8)
    rng = np.random.RandomState(0)
    toks = np.asarray([[5, 6, 127, 0, 0, 0, 0, 0]])
    toks2 = np.asarray([[5, 6, 7, 8, 127, 0, 0, 0]])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(toks))["params"]
    o1 = model.apply({"params": params}, jnp.asarray(toks))
    o2 = model.apply({"params": params}, jnp.asarray(toks2))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_text_encoder_hash_and_cache():
    enc = TextEncoder("HASH", dim=32)
    e1 = enc.encode(["place a table", "add a chair"])
    assert e1.shape == (2, 32)
    e2 = enc.encode(["place a table"])
    np.testing.assert_array_equal(e1[0], e2[0])  # cached
    # different prompts differ
    assert not np.allclose(e1[0], e1[1])


def test_text_encoder_clip_random_init():
    enc = TextEncoder("CLIP", dim=16)
    # tiny? full-size tower is heavy on CPU; use the facade with the real
    # arch but one short prompt to keep it quick
    enc.model = CLIPTextTransformer(vocab_size=49408, width=32, heads=4,
                                    layers=1, embed_dim=16)
    enc.params = enc.model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 77), jnp.int32))["params"]
    enc._apply = jax.jit(lambda p, t: enc.model.apply({"params": p}, t))
    out = enc.encode(["hello there"])
    assert out.shape == (1, 16)


def test_text_encoder_cached_mode():
    cache = {"a": np.ones(8, np.float32)}
    enc = TextEncoder("CACHED", dim=8, cache=cache)
    out = enc.encode(["a", "a"])
    assert out.shape == (2, 8)
    with pytest.raises(KeyError):
        enc.encode(["missing"])


@pytest.mark.slow  # 30 s: builds the full random-init BERT tower
def test_text_encoder_bert_fallback_flagged():
    """Offline BERT: random-init + hash tokenizer, loudly flagged; the
    require_parity path refuses instead (reference model/sdm.py:279-285)."""
    import pytest

    from lsdm_tpu.models.text import TextEncoder

    with pytest.warns(UserWarning, match="random-init"):
        enc = TextEncoder("BERT", dim=32)
    out = enc.encode(["sit on the chair", "a lamp"])
    assert out.shape == (2, 32) and out.dtype == "float32"

    with pytest.raises(RuntimeError, match="bert-base-uncased"):
        TextEncoder("BERT", dim=32, require_parity=True)


# ---------------------------------------------------------------------------
# BPE asset vendoring (VERDICT r03 item 5)


def _write_merges_txt(path, merges):
    path.write_text("#version: test\n"
                    + "\n".join(" ".join(m) for m in merges) + "\n")


_TOY_MERGES = [("t", "h"), ("th", "e</w>"), ("c", "h"), ("ch", "a"),
               ("cha", "i"), ("chai", "r</w>")]


def test_vendor_clip_bpe_refuses_truncated_then_forces(tmp_path, monkeypatch):
    from lsdm_tpu.models import text as text_lib

    monkeypatch.delenv("LSDM_TPU_CLIP_BPE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty_hf"))
    dest = tmp_path / "assets" / "bpe_simple_vocab_16e6.txt.gz"
    monkeypatch.setattr(text_lib, "CLIP_BPE_ASSET", str(dest))

    src = tmp_path / "merges.txt"
    _write_merges_txt(src, _TOY_MERGES)
    # non-canonical merge count -> refuse without force
    with pytest.raises(ValueError, match="canonical"):
        text_lib.vendor_clip_bpe(str(src))
    info = text_lib.vendor_clip_bpe(str(src), force=True)
    assert info["parity_grade"] is False and info["merges"] == len(_TOY_MERGES)
    assert dest.exists() and (tmp_path / "assets"
                              / (dest.name + ".sha256")).exists()
    # the resolution chain now finds the vendored asset with no flags
    assert text_lib.resolve_clip_bpe(None) == str(dest)
    # and it tokenizes identically to the original source
    a = text_lib.SimpleTokenizer(str(src))
    b = text_lib.SimpleTokenizer(str(dest))
    assert a.encode("the chair") == b.encode("the chair")


def test_vendor_canonical_count_is_parity_grade(tmp_path, monkeypatch):
    from lsdm_tpu.models import text as text_lib

    monkeypatch.delenv("LSDM_TPU_CLIP_BPE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty_hf"))
    dest = tmp_path / "assets" / "bpe_simple_vocab_16e6.txt.gz"
    monkeypatch.setattr(text_lib, "CLIP_BPE_ASSET", str(dest))

    # synthetic CLIP-shaped table with the canonical count: unique
    # `tok tok</w>` pair per line (the content guard checks the shape)
    merges = [(f"a{i}", f"b{i}</w>") for i in
              range(text_lib.CLIP_CANONICAL_MERGES)]
    src = tmp_path / "merges.txt"
    _write_merges_txt(src, merges)
    info = text_lib.vendor_clip_bpe(str(src))  # no force needed
    assert info["parity_grade"] is True
    assert info["merges"] == text_lib.CLIP_CANONICAL_MERGES


def test_vendor_rejects_wrong_table_and_bad_explicit_source(tmp_path,
                                                            monkeypatch):
    """Round-4 review pins: (a) an OVERSIZED non-CLIP table (e.g. GPT-2's
    50k byte-BPE merges) slices down to the canonical count but must not
    vendor as parity-grade; (b) an explicit --source that does not exist
    must error, never fall through to the env/HF resolution chain."""
    from lsdm_tpu.models import text as text_lib

    monkeypatch.delenv("LSDM_TPU_CLIP_BPE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty_hf"))
    dest = tmp_path / "assets" / "bpe_simple_vocab_16e6.txt.gz"
    monkeypatch.setattr(text_lib, "CLIP_BPE_ASSET", str(dest))

    # (a) GPT-2-style table, 50k merges with Ġ markers and no </w>
    gpt2 = [("Ġt", f"x{i}") for i in range(50_000)]
    src = tmp_path / "merges.txt"
    _write_merges_txt(src, gpt2)
    with pytest.raises(ValueError, match="CLIP merges table"):
        text_lib.vendor_clip_bpe(str(src))
    info = text_lib.vendor_clip_bpe(str(src), force=True)
    assert info["parity_grade"] is False

    # (b) bad explicit source errors even though a resolvable fallback
    # (the just-vendored asset / env var) exists
    monkeypatch.setenv("LSDM_TPU_CLIP_BPE", str(src))
    with pytest.raises(FileNotFoundError, match="not a merges file"):
        text_lib.vendor_clip_bpe(str(tmp_path / "typo" / "merges.txt"))


def test_vendored_asset_hash_pin_detects_corruption(tmp_path, monkeypatch):
    import gzip

    from lsdm_tpu.models import text as text_lib

    monkeypatch.delenv("LSDM_TPU_CLIP_BPE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty_hf"))
    dest = tmp_path / "assets" / "bpe_simple_vocab_16e6.txt.gz"
    monkeypatch.setattr(text_lib, "CLIP_BPE_ASSET", str(dest))

    src = tmp_path / "merges.txt"
    _write_merges_txt(src, _TOY_MERGES)
    text_lib.vendor_clip_bpe(str(src), force=True)
    assert text_lib.resolve_clip_bpe(None) == str(dest)  # hash ok
    with gzip.open(dest, "wb") as f:  # swap content, keep the sidecar
        f.write(b"#version: tampered\nx y\n")
    with pytest.raises(RuntimeError, match="pinned"):
        text_lib.resolve_clip_bpe(None)


def test_resolve_text_encoder_auto(tmp_path, monkeypatch):
    from lsdm_tpu.models import text as text_lib

    monkeypatch.delenv("LSDM_TPU_CLIP_BPE", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "empty_hf"))
    monkeypatch.setattr(text_lib, "CLIP_BPE_ASSET",
                        str(tmp_path / "no_asset.gz"))
    # no source anywhere -> offline hash fallback
    assert text_lib.resolve_text_encoder("auto") == "HASH"
    # explicit choices pass through even with no source
    assert text_lib.resolve_text_encoder("HASH") == "HASH"
    assert text_lib.resolve_text_encoder("CLIP") == "CLIP"
    # a source appears (env var) -> auto resolves to CLIP
    src = tmp_path / "merges.txt"
    _write_merges_txt(src, _TOY_MERGES)
    monkeypatch.setenv("LSDM_TPU_CLIP_BPE", str(src))
    assert text_lib.resolve_text_encoder("auto") == "CLIP"
