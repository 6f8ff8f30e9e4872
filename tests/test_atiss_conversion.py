"""Torch-oracle conversion parity for the ATISS/MIME stack.

Inline torch replicas of the reference's vendored ATISS networks
(``atiss/scene_synthesis/networks/``) at random init: convert their real
``state_dict()`` via ``convert_atiss_state_dict`` and assert the composed
flax forward matches.  This is the released-checkpoint parity proxy for
BASELINE configs 3-4 (no released weights exist in this environment).

Replicated reference quirks under test:
  * FrozenBatchNorm eps-fold (``frozen_batchnorm.py:38`` folds ``bn.eps``
    into ``running_var``; forward uses a bare rsqrt, :72);
  * conv1 surgery AFTER the freeze (``feature_extractors.py:37-46``) — the
    new conv1 is a plain Conv2d while bn1 is already frozen;
  * batch-axis attention: torch ``nn.TransformerEncoder`` defaults to
    ``batch_first=False`` but the reference feeds (B, L, E)
    (``autoregressive_transformer.py:140``) -> ``torch_seq_axis_quirk``;
  * AlexNet's channel-major flatten (``feature_extractors.py:74``).
"""

import os
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

from lsdm_tpu.models import atiss as A
from lsdm_tpu.models.feature_extractors import (AlexNetFeatures,
                                                ResNet18Features)
from lsdm_tpu.train.checkpoint import convert_atiss_state_dict


@pytest.fixture(autouse=True)
def _high_precision():
    with jax.default_matmul_precision("highest"):
        yield


def t2n(t):
    return t.detach().numpy()


# --------------------------------------------------------------------------
# torch replicas (oracles; re-derived from the reference, never imported)


class TFrozenBN(nn.Module):
    """frozen_batchnorm.py:14-76"""

    def __init__(self, n):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(n))
        self.bias = nn.Parameter(torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))

    @classmethod
    def from_bn(cls, bn):
        fbn = cls(bn.num_features)
        with torch.no_grad():
            fbn.weight[...] = bn.weight
            fbn.bias[...] = bn.bias
            fbn.running_mean[...] = bn.running_mean
            fbn.running_var[...] = bn.running_var + bn.eps  # the eps fold
        return fbn

    def forward(self, x):
        scale = self.weight * self.running_var.rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


def freeze_bn_(m):
    for name, child in list(m.named_children()):
        if isinstance(child, nn.BatchNorm2d):
            setattr(m, name, TFrozenBN.from_bn(child))
        else:
            freeze_bn_(child)


class TBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class TResNet18Inner(nn.Module):
    """torchvision resnet18 topology + the ATISS surgery
    (feature_extractors.py:27-52)."""

    def __init__(self, input_channels, feature_size, freeze):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TBasicBlock(64, 128, 2), TBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TBasicBlock(128, 256, 2), TBasicBlock(256, 256))
        self.layer4 = nn.Sequential(TBasicBlock(256, 512, 2), TBasicBlock(512, 512))
        self._randomize()
        if freeze:
            freeze_bn_(self)  # BEFORE conv1 surgery, like the reference
        self.conv1 = nn.Conv2d(input_channels, 64, 7, 2, 3, bias=False)
        self.fc = nn.Sequential(nn.Linear(512, 512), nn.ReLU(),
                                nn.Linear(512, feature_size))
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))

    def _randomize(self):
        """Non-default weights/stats at activation-preserving scale (the
        default torch init compounds through 8 conv layers into ~1e9
        activations, which only obscures comparisons)."""
        g = torch.Generator().manual_seed(7)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                with torch.no_grad():
                    fan_in = m.weight[0].numel()
                    m.weight.normal_(0, (2.0 / fan_in) ** 0.5, generator=g)
            if isinstance(m, nn.BatchNorm2d):
                with torch.no_grad():
                    m.running_mean.normal_(0, 0.5, generator=g)
                    m.running_var.uniform_(0.5, 2.0, generator=g)
                    m.weight.normal_(1.0, 0.2, generator=g)
                    m.bias.normal_(0, 0.2, generator=g)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class TResNetFeat(nn.Module):
    def __init__(self, input_channels=1, feature_size=32, freeze=True):
        super().__init__()
        self._feature_extractor = TResNet18Inner(input_channels, feature_size,
                                                 freeze)

    def forward(self, x):
        return self._feature_extractor(x)


class TAlexFeat(nn.Module):
    """feature_extractors.py:55-76 (torchvision alexnet.features)."""

    def __init__(self, input_channels=1, feature_size=32):
        super().__init__()
        inner = nn.Module()
        inner.features = nn.Sequential(
            nn.Conv2d(input_channels, 64, 11, 4, 2), nn.ReLU(True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
            nn.MaxPool2d(3, 2),
        )
        inner.avgpool = nn.AdaptiveAvgPool2d((6, 6))
        self._feature_extractor = inner
        self._fc = nn.Linear(9216, feature_size)

    def forward(self, x):
        X = self._feature_extractor.features(x)
        X = self._feature_extractor.avgpool(X)
        return self._fc(X.view(X.shape[0], -1))


class TFixedPE:
    """base.py:13-26 (deterministic, parameter-free)."""

    def __init__(self, proj_dims=64, val=0.1):
        ll = proj_dims // 2
        exb = 2 * torch.linspace(0, ll - 1, ll) / proj_dims
        self.sigma = (2 * torch.pi / torch.pow(val, exb)).view(1, -1)

    def __call__(self, x):
        return torch.cat([torch.sin(x * self.sigma), torch.cos(x * self.sigma)],
                         dim=-1)


class TDMLL(nn.Module):
    """hidden_to_output.py:53-306 (scalar=True is the LSDM fork's _mlp with
    the trailing Linear(out,1); scalar=False the upstream DMLL heads)."""

    def __init__(self, h, C, n_mix=4, scalar=True):
        super().__init__()
        self.n_classes = C
        self.class_layer = nn.Linear(h, C)
        self.fc_class_labels = nn.Linear(C, 64)
        self.pe = TFixedPE(64)

        def mlp(hs, out):
            layers = [nn.Linear(hs, 2 * hs), nn.ReLU(),
                      nn.Linear(2 * hs, hs), nn.ReLU(), nn.Linear(hs, out)]
            if scalar:
                layers += [nn.ReLU(), nn.Linear(out, 1)]
            return nn.Sequential(*layers)

        ch = h + 64
        self.centroid_layer_x = mlp(ch, n_mix * 3)
        self.centroid_layer_y = mlp(ch, n_mix * 3)
        self.centroid_layer_z = mlp(ch, n_mix * 3)
        ch = ch + 64 * 3
        self.angle_layer = mlp(ch, n_mix * 3)
        ch = ch + 64
        self.size_layer_x = mlp(ch, n_mix * 3)
        self.size_layer_y = mlp(ch, n_mix * 3)
        self.size_layer_z = mlp(ch, n_mix * 3)

    def forward(self, x, sp):
        c = self.fc_class_labels(sp["class_labels_tr"].float())
        tr = sp["translations_tr"].float()
        tx, ty, tz = (self.pe(tr[:, :, i:i + 1]) for i in range(3))
        a = self.pe(sp["angles_tr"].float())
        class_labels = self.class_layer(x)
        cf = torch.cat([x, c], -1)
        translations = (self.centroid_layer_x(cf), self.centroid_layer_y(cf),
                        self.centroid_layer_z(cf))
        tf = torch.cat([cf, tx, ty, tz], -1)
        angles = self.angle_layer(tf)
        sf = torch.cat([tf, a], -1)
        sizes = (self.size_layer_x(sf), self.size_layer_y(sf),
                 self.size_layer_z(sf))
        return {"class_labels": class_labels, "translations": translations,
                "sizes": sizes, "angles": angles}

    def pred_dmll_params_translation(self, x, class_labels):
        """hidden_to_output.py:240-264 (upstream, scalar=False only)."""
        B, L, _ = class_labels.shape
        c = self.fc_class_labels(class_labels)
        cf = torch.cat([x, c], dim=-1)

        def unpack(pred):
            nr = pred.shape[1] // 3
            probs = torch.softmax(pred[:, :nr], dim=-1)
            means = pred[:, nr:2 * nr]
            scales = torch.nn.functional.elu(pred[:, 2 * nr:]) + 1.0001
            return probs, means, scales

        return tuple(
            unpack(layer(cf).reshape(B * L, -1))
            for layer in (self.centroid_layer_x, self.centroid_layer_y,
                          self.centroid_layer_z))


class TATISS(nn.Module):
    """autoregressive_transformer.py:97-141 / mime.py:5-64 (forward path)."""

    def __init__(self, C, n_layers=2, n_heads=4, dim_ff=128, fs=32,
                 contact=False, scalar=True, n_mix=4):
        super().__init__()
        D = 528 if contact else 512
        layer = nn.TransformerEncoderLayer(
            d_model=D, nhead=n_heads, dim_feedforward=dim_ff, activation="gelu")
        self.transformer_encoder = nn.TransformerEncoder(layer,
                                                         num_layers=n_layers)
        self.start_token_embedding = nn.Parameter(torch.randn(1, D))
        self.empty_token_embedding = nn.Parameter(torch.randn(1, D))
        self.feature_extractor = TResNetFeat(1, fs, freeze=True)
        self.fc_room_f = nn.Linear(fs, D)
        self.fc_class = nn.Linear(C, 64, bias=False)
        self.fc = nn.Linear(D, D)  # hidden_dims == d_model in real configs
        if contact:
            self.contact_fc = nn.Linear(1, 16, bias=False)
        self.hidden2output = TDMLL(D, C, n_mix, scalar)
        self.pe = TFixedPE(64)
        self.contact = contact

    def forward(self, sp):
        pe = self.pe
        class_f = self.fc_class(sp["class_labels"])
        tr, sz = sp["translations"], sp["sizes"]
        pos_f = torch.cat([pe(tr[:, :, i:i + 1]) for i in range(3)], -1)
        size_f = torch.cat([pe(sz[:, :, i:i + 1]) for i in range(3)], -1)
        angle_f = pe(sp["angles"])
        feats = [class_f, pos_f, size_f, angle_f]
        if self.contact:
            feats = [self.contact_fc(sp["contact_labels"])] + feats
        X = torch.cat(feats, -1)
        B = X.shape[0]
        room_f = self.fc_room_f(self.feature_extractor(sp["room_layout"]))
        X = torch.cat([room_f[:, None],
                       self.empty_token_embedding.expand(B, -1, -1), X], 1)
        X = self.fc(X)
        # batch-first tensor into a batch_first=False encoder: the reference's
        # axis quirk, preserved verbatim (autoregressive_transformer.py:140)
        F = self.transformer_encoder(X)
        return self.hidden2output(F[:, 1:2], sp)


# --------------------------------------------------------------------------
# feature-extractor parity


@pytest.mark.parametrize("freeze", [True, False])
def test_resnet18_conversion_parity(freeze):
    torch.manual_seed(0)
    tm = TResNetFeat(1, 32, freeze=freeze).eval()
    x = torch.randn(2, 1, 64, 64)
    with torch.no_grad():
        t_out = tm(x)

    sd = {"feature_extractor._feature_extractor." + k: t2n(v)
          for k, v in tm._feature_extractor.state_dict().items()}
    params, stats = convert_atiss_state_dict(sd)
    jm = ResNet18Features(feature_size=32, freeze_bn=freeze)
    j_out = jm.apply(
        {"params": params["feature_extractor"],
         "batch_stats": stats["feature_extractor"]},
        jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(j_out), t2n(t_out), atol=3e-4)


def test_alexnet_conversion_parity():
    torch.manual_seed(1)
    tm = TAlexFeat(1, 32).eval()
    x = torch.randn(2, 1, 64, 64)
    with torch.no_grad():
        t_out = tm(x)

    sd = {"feature_extractor." + k: t2n(v) for k, v in tm.state_dict().items()}
    params, _ = convert_atiss_state_dict(sd)
    jm = AlexNetFeatures(feature_size=32)
    j_out = jm.apply({"params": params["feature_extractor"]},
                     jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(j_out), t2n(t_out), atol=3e-4)


# --------------------------------------------------------------------------
# full-model conversion parity


def _sample_params(C, B=2, L=3, contact=False, seed=3):
    g = torch.Generator().manual_seed(seed)
    oh = torch.eye(C)[torch.randint(0, C, (B, L), generator=g)]
    sp = {
        "class_labels": oh,
        "translations": torch.randn(B, L, 3, generator=g) * 0.5,
        "sizes": torch.rand(B, L, 3, generator=g),
        "angles": torch.randn(B, L, 1, generator=g) * 0.3,
        "room_layout": torch.rand(B, 1, 64, 64, generator=g),
        "class_labels_tr": torch.eye(C)[torch.randint(0, C, (B, 1), generator=g)],
        "translations_tr": torch.randn(B, 1, 3, generator=g) * 0.5,
        "sizes_tr": torch.rand(B, 1, 3, generator=g),
        "angles_tr": torch.randn(B, 1, 1, generator=g) * 0.3,
    }
    if contact:
        sp["contact_labels"] = (torch.rand(B, L, 1, generator=g) > 0.5).float()
    return sp


@pytest.mark.parametrize("contact", [False, True], ids=["atiss", "mime"])
def test_full_atiss_conversion_parity(contact):
    torch.manual_seed(2)
    C = 10
    tm = TATISS(C, contact=contact).eval()
    sp = _sample_params(C, contact=contact)
    with torch.no_grad():
        t_out = tm(sp)

    params, stats = convert_atiss_state_dict(
        {k: t2n(v) for k, v in tm.state_dict().items()})
    jm = A.AutoregressiveTransformer(
        n_classes=C, n_layers=2, n_heads=4, dim_ff=128, n_mixtures=4,
        feature_size=32, contact=contact, feature_extractor_name="resnet18",
        hidden_dims=528 if contact else 512, torch_seq_axis_quirk=True)
    j_out = jm.apply({"params": params, "batch_stats": stats},
                     {k: jnp.asarray(t2n(v)) for k, v in sp.items()})

    np.testing.assert_allclose(np.asarray(j_out.class_labels),
                               t2n(t_out["class_labels"]), atol=5e-4)
    for i, ax in enumerate("xyz"):
        np.testing.assert_allclose(
            np.asarray(getattr(j_out, f"translations_{ax}")),
            t2n(t_out["translations"][i]), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(getattr(j_out, f"sizes_{ax}")),
            t2n(t_out["sizes"][i]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(j_out.angles),
                               t2n(t_out["angles"]), atol=5e-4)


def test_distribution_translations_parity():
    """Upstream DMLL heads (scalar_head=False): converted
    pred_dmll_params_translation matches torch."""
    torch.manual_seed(4)
    C = 10
    tm = TATISS(C, scalar=False).eval()
    sp = _sample_params(C)
    B, L = 2, 3
    x = torch.randn(B, 1, 512)
    cls = torch.eye(C)[torch.randint(0, C, (B, 1))]
    with torch.no_grad():
        t_params = tm.hidden2output.pred_dmll_params_translation(x, cls)

    params, stats = convert_atiss_state_dict(
        {k: t2n(v) for k, v in tm.state_dict().items()})
    jm = A.AutoregressiveTransformer(
        n_classes=C, n_layers=2, n_heads=4, dim_ff=128, n_mixtures=4,
        feature_size=32, scalar_head=False, feature_extractor_name="resnet18",
        torch_seq_axis_quirk=True)
    j_params = jm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(t2n(x)),
        jnp.asarray(t2n(cls)),
        method=lambda m, F, c: m.hidden2output.pred_dmll_params_translation(F, c))
    for axis in range(3):
        for part in range(3):  # probs, means, scales
            np.testing.assert_allclose(
                np.asarray(j_params[axis][part]), t2n(t_params[axis][part]),
                atol=5e-5)


# --------------------------------------------------------------------------
# generation APIs (jit-compiled fixed-shape loops)


def _tiny_model_and_vars(C=6, contact=False, scalar_head=True, seed=0):
    model = A.AutoregressiveTransformer(
        n_classes=C, n_layers=1, n_heads=4, dim_ff=32, n_mixtures=2,
        feature_size=8, contact=contact, scalar_head=scalar_head)
    boxes = A._empty_boxes(1, 2, C, contact)
    boxes["room_layout"] = jnp.ones((1, 1, 16, 16))
    boxes.update({
        "class_labels_tr": jnp.ones((1, 1, C)),
        "translations_tr": jnp.ones((1, 1, 3)),
        "sizes_tr": jnp.ones((1, 1, 3)),
        "angles_tr": jnp.ones((1, 1, 1)),
    })
    return model, model.init(jax.random.PRNGKey(seed), boxes)


def test_generate_boxes_contract():
    model, variables = _tiny_model_and_vars()
    room = jnp.ones((1, 1, 16, 16))
    key = jax.random.PRNGKey(1)
    boxes, count = A.generate_boxes(model, variables, room, key, max_boxes=5)
    n = int(count)
    assert boxes["class_labels"].shape == (1, 5, 6)
    assert 1 <= n <= 5
    # slots < count valid, >= count untouched
    np.testing.assert_array_equal(
        np.asarray(boxes["valid_mask"][0]),
        (np.arange(5) < n).astype(np.float32))
    # determinism with the same key
    boxes2, count2 = A.generate_boxes(model, variables, room, key, max_boxes=5)
    assert int(count2) == n
    np.testing.assert_allclose(np.asarray(boxes2["translations"]),
                               np.asarray(boxes["translations"]))


def test_complete_scene_keeps_given_boxes():
    model, variables = _tiny_model_and_vars()
    room = jnp.ones((1, 1, 16, 16))
    given = {
        "class_labels": jax.nn.one_hot(jnp.array([[0, 2]]), 6),
        "translations": jnp.full((1, 2, 3), 0.25),
        "sizes": jnp.full((1, 2, 3), 0.5),
        "angles": jnp.zeros((1, 2, 1)),
    }
    boxes, count = A.complete_scene(model, variables, given, room,
                                    jax.random.PRNGKey(2), max_boxes=3)
    assert int(count) >= 2
    np.testing.assert_allclose(np.asarray(boxes["translations"][:, :2]),
                               np.asarray(given["translations"]))
    np.testing.assert_allclose(np.asarray(boxes["class_labels"][:, :2]),
                               np.asarray(given["class_labels"]))


def test_add_object_appends_class_and_end_symbol():
    model, variables = _tiny_model_and_vars()
    room = jnp.ones((1, 1, 16, 16))
    given = {
        "class_labels": jax.nn.one_hot(jnp.array([[1]]), 6),
        "translations": jnp.zeros((1, 1, 3)),
        "sizes": jnp.full((1, 1, 3), 0.5),
        "angles": jnp.zeros((1, 1, 1)),
    }
    out = A.add_object(model, variables, room, 3, given, jax.random.PRNGKey(3))
    assert out["class_labels"].shape == (1, 3, 6)
    assert int(jnp.argmax(out["class_labels"][0, 1])) == 3  # requested class
    assert int(jnp.argmax(out["class_labels"][0, 2])) == 5  # end symbol
    # with_class_and_translation pins the translation too
    tr = jnp.asarray([0.1, 0.2, 0.3])
    out2 = A.add_object_with_class_and_translation(
        model, variables, room, 2, tr, given, jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(out2["translations"][0, 1]),
                               np.asarray(tr))


def test_distribution_translations_shapes():
    model, variables = _tiny_model_and_vars(scalar_head=False)
    room = jnp.ones((1, 1, 16, 16))
    given = {
        "class_labels": jax.nn.one_hot(jnp.array([[1]]), 6),
        "translations": jnp.zeros((1, 1, 3)),
        "sizes": jnp.full((1, 1, 3), 0.5),
        "angles": jnp.zeros((1, 1, 1)),
    }
    out = A.distribution_translations(model, variables, given, room, 4)
    assert len(out) == 3
    for probs, means, scales in out:
        assert probs.shape == (1, 2)  # (B*L, n_mixtures)
        np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0,
                                   atol=1e-6)
        assert bool(jnp.all(scales > 0.0))  # elu(x) + 1.0001 > 0


def test_generate_scenes_cli(tmp_path):
    """e2e: init a tiny-ish model, save a checkpoint, run the generation CLI,
    check the scene npz contract (incl. complete_from)."""
    import subprocess
    import sys

    from conftest import cli_env
    from lsdm_tpu import config as cfg_lib
    from lsdm_tpu.run._baseline_common import build_model
    from lsdm_tpu.train import checkpoint as ckpt_lib
    from lsdm_tpu.train.state import create_train_state, make_optimizer

    num_cats = cfg_lib.num_cats_for("proxd")
    model, input_dims = build_model("atiss", num_cats)
    boxes0 = A._empty_boxes(1, 2, input_dims, False)
    boxes0["room_layout"] = jnp.ones((1, 1, 64, 64))
    boxes0.update({
        "class_labels_tr": jnp.ones((1, 1, input_dims)),
        "translations_tr": jnp.ones((1, 1, 3)),
        "sizes_tr": jnp.ones((1, 1, 3)),
        "angles_tr": jnp.ones((1, 1, 1)),
    })
    variables = model.init(jax.random.PRNGKey(0), boxes0)
    state = create_train_state(variables, make_optimizer())
    ckpt = str(tmp_path / "m.ckpt")
    ckpt_lib.save(ckpt, state)

    out = str(tmp_path / "scenes")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "lsdm_tpu.run.generate_scenes",
         "--load_model", ckpt, "--n_scenes", "2", "--max_boxes", "5",
         "--output_dir", out, "--platform", "cpu"],
        cwd=repo, env=cli_env(), capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    d = np.load(os.path.join(out, "scene_0000.npz"))
    assert d["class_labels"].shape == (5, input_dims)
    assert 1 <= int(d["count"]) <= 5
    n = int(d["valid_mask"].sum())
    assert n == int(d["count"])

    # complete_from: keep 1 given box, append up to 3
    np.savez(tmp_path / "partial.npz",
             class_labels=np.asarray(d["class_labels"][:1]),
             translations=np.asarray(d["translations"][:1]),
             sizes=np.asarray(d["sizes"][:1]),
             angles=np.asarray(d["angles"][:1]))
    out2 = str(tmp_path / "scenes2")
    r = subprocess.run(
        [sys.executable, "-m", "lsdm_tpu.run.generate_scenes",
         "--load_model", ckpt, "--n_scenes", "1", "--max_boxes", "3",
         "--complete_from", str(tmp_path / "partial.npz"),
         "--output_dir", out2, "--platform", "cpu"],
        cwd=repo, env=cli_env(), capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    d2 = np.load(os.path.join(out2, "scene_0000.npz"))
    assert d2["class_labels"].shape == (4, input_dims)  # 1 given + 3 slots
    np.testing.assert_allclose(d2["translations"][0], d["translations"][0])
