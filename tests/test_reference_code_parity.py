"""Parity against the LITERAL reference code (VERDICT round-4 item 1).

Every other parity test in this repo compares against hand-written torch
replicas (tests/test_torch_parity.py, tools/baseline_torch.py) — a
transcription error would corrupt oracle and subject identically and hide.
This module imports the actual reference package from ``/root/reference``
(read-only) with four one-line module stubs (``turtle``/``mne``/
``mne_bids``/``hydra`` — the only imports missing from this image, used by
``meg_decoding/models.py:2,11-14`` and ``matlab_utils/load_meg.py:7``),
transplants weights from the flax models into the REAL reference classes,
and asserts:

 a. forward parity — BrainEncoder (``models.py:341-383``), the
    BrainEncoderSeq2Static variant (``models.py:465-512``), EEGNet
    (``models.py:32-94``), LinearEncoder (``models.py:325-337``), with the
    sensor layout produced by the literal ``ch_locations_2d``
    (``utils/layout.py:34-45``, GOD montage path);
 b. loss parity — CLIPLoss value AND input/temperature gradients
    (``utils/loss.py:55-112``), MSELoss (``:43-52``), the retrieval
    Classifier (``models.py:386-460``), MyCLIPLikeClassificationLoss eval
    modes (``:115-249``);
 c. literal certificates for the documented deviations: SameLabelLoss's
    ``Z[label]`` anchor (PARITY dev. 2), the dead smoothing branch that
    zeroes train-mode classification targets (PARITY dev. 7), and the
    degenerate self-similarity vector in similarity_crossentropy mode;
 d. (slow) one seed of the convergence anchor re-run with the reference
    classes as the torch side — same transplanted init, same batch
    schedule, final top-10 retrieval within the established gate.

The module skips cleanly when /root/reference is not present.
"""

import csv
import json
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from meg_decoding_tpu.models.brain_encoder import (  # noqa: E402
    BrainEncoder,
    BrainEncoderSeq2Static,
)
from meg_decoding_tpu.models.eegnet import EEGNet, LinearEncoder  # noqa: E402
from meg_decoding_tpu.objectives.clip import (  # noqa: E402
    _cosine_logits,
    _cross_entropy,
    _normalize,
    clip_loss,
)
from meg_decoding_tpu.objectives.losses import (  # noqa: E402
    clip_like_classification_loss,
    mse_loss,
    same_label_loss,
)
from meg_decoding_tpu.objectives.retrieval import retrieval_accuracy  # noqa: E402

REF_ROOT = os.environ.get("MEG_REFERENCE_ROOT", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "meg_decoding")),
    reason="reference checkout not present",
)

C = 12  # sensor count for the fabricated GOD montage


class NS(dict):
    """OmegaConf-surrogate: attribute AND item access (the reference mixes
    ``args.preprocs.brain_resample_rate`` and ``args.preprocs["last4layers"]``)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(k) from e


def ns(**kw):
    return NS({k: (ns(**v) if isinstance(v, dict) else v) for k, v in kw.items()})


@pytest.fixture(scope="session")
def ref():
    """Import the literal reference package with the four module stubs."""
    for name in ("turtle", "mne", "mne_bids"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.forward = None  # `from turtle import forward` (models.py:2)
            sys.modules[name] = m
    if "hydra" not in sys.modules:
        h = types.ModuleType("hydra")
        h.initialize = h.compose = None  # load_meg.py:7
        sys.modules["hydra"] = h
    sys.path.insert(0, REF_ROOT)
    try:
        import meg_decoding.models as rmodels
        import meg_decoding.utils.layout as rlayout
        import meg_decoding.utils.loss as rloss
    finally:
        # keep sys.modules (imports resolved) but stop shadowing our tree
        sys.path.remove(REF_ROOT)
    return types.SimpleNamespace(models=rmodels, loss=rloss, layout=rlayout)


@pytest.fixture(scope="session")
def god_geo(tmp_path_factory):
    """Fabricated GOD montage CSV + region JSON so the literal
    ``ch_locations_2d``/``read_montage``/``roi`` chain runs end to end."""
    tmp = tmp_path_factory.mktemp("ref_geo")
    rng = np.random.RandomState(0)
    mont = rng.rand(C, 3) * 2.0 - 1.0
    montage_path = str(tmp / "montage.csv")
    with open(montage_path, "w", newline="") as f:
        w = csv.writer(f)
        for row in mont:
            w.writerow([float(r) for r in row])
    region_path = str(tmp / "ch_region.json")
    with open(region_path, "w") as f:
        json.dump({"occipital": {"left": list(range(1, C + 1))}}, f)
    return dict(
        dataset="GOD",
        root_dir=str(tmp),
        montage_path=montage_path,
        ch_region_path=region_path,
        region=["occipital/left"],
    )


def _enc_args(god_geo, *, num_subjects=3, D1=8, D2=10, F=16, K=4,
              d_drop=0.0, seq2seq=False, ks=None):
    d = dict(god_geo)
    d.update(num_subjects=num_subjects, D1=D1, D2=D2, F=F, K=K,
             d_drop=d_drop, seq2seq=seq2seq,
             preprocs={"last4layers": False})
    if ks is not None:
        d["ConvBlocks"] = {"ks": list(ks)}
    return ns(**d)


def _t(x):
    return torch.tensor(np.asarray(x))


def _dense_as_conv(k):  # flax Dense (in, out) → torch conv1d (out, in, 1)
    return _t(np.asarray(k).T[:, :, None])


def _conv2d_w(kernel):  # flax (kh, kw, in/g, out) → torch (out, in/g, kh, kw)
    return _t(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))


def _transplant_encoder(p, tm, n_sub):
    """flax BrainEncoder(+Seq2Static) params → the literal reference module."""
    from tests.fixtures import transplant_conv_blocks

    with torch.no_grad():
        sb = p["subject_block"]
        z = torch.complex(_t(sb["spatial_attention"]["z_re"]).float(),
                          _t(sb["spatial_attention"]["z_im"]).float())
        tm.subject_block.spatial_attention.z.copy_(z)
        tm.subject_block.conv.weight.copy_(_dense_as_conv(sb["conv"]["kernel"]))
        tm.subject_block.conv.bias.copy_(_t(sb["conv"]["bias"]))
        W = np.asarray(sb["subject_layer"]["weight"])  # (S, D, D): btc,bcd->btd
        for s in range(n_sub):
            tm.subject_block.subject_layer[s].weight.copy_(_t(W[s].T[:, :, None]))
        # reference conv_blocks is an nn.Sequential with ConvBlock attrs
        # conv0/batchnorm0/conv1/batchnorm1/conv2 — adapt to the shared helper
        blocks = []
        for k in range(5):
            b = getattr(tm.conv_blocks, f"conv{k}")
            blocks.append({"conv0": b.conv0, "bn0": b.batchnorm0,
                           "conv1": b.conv1, "bn1": b.batchnorm1,
                           "conv2": b.conv2})
        transplant_conv_blocks(p, blocks)
        tm.conv_final1.weight.copy_(_dense_as_conv(p["conv_final1"]["kernel"]))
        tm.conv_final1.bias.copy_(_t(p["conv_final1"]["bias"]))
        tm.conv_final2.weight.copy_(_dense_as_conv(p["conv_final2"]["kernel"]))
        tm.conv_final2.bias.copy_(_t(p["conv_final2"]["bias"]))


# ---------------------------------------------------------------------------
# a. forward parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seq2seq", [False, True])
def test_brain_encoder_forward_matches_reference(ref, god_geo, seq2seq):
    args = _enc_args(god_geo, seq2seq=seq2seq)
    loc = ref.layout.ch_locations_2d(args).numpy()  # literal layout.py:34-45
    B, T = 4, 48
    rng = np.random.RandomState(1)
    X = rng.randn(B, C, T).astype(np.float32)
    subs = np.array([0, 1, 2, 0])

    model = BrainEncoder(loc=loc, num_subjects=3, D1=args.D1, D2=args.D2,
                         F=args.F, K=args.K, d_drop=0.0, seq2seq=seq2seq)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "spatial": jax.random.PRNGKey(1)},
        jnp.asarray(X), jnp.asarray(subs))
    out_jax = np.asarray(model.apply(variables, jnp.asarray(X),
                                     jnp.asarray(subs), train=False))

    tm = ref.models.BrainEncoder(args)
    _transplant_encoder(variables["params"], tm, 3)
    tm.eval()
    with torch.no_grad():
        out_ref = tm(_t(X), list(subs)).numpy()
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-3, atol=1e-4)


def test_brain_encoder_seq2static_matches_reference(ref, god_geo):
    ks = [3, 3, 5, 5, 5]
    args = _enc_args(god_geo, seq2seq=False, ks=ks)
    loc = ref.layout.ch_locations_2d(args).numpy()
    B, T = 4, 48
    rng = np.random.RandomState(2)
    X = rng.randn(B, C, T).astype(np.float32)
    subs = np.array([2, 1, 0, 1])

    model = BrainEncoderSeq2Static(loc=loc, num_subjects=3, ks_list=ks,
                                   D1=args.D1, D2=args.D2, F=args.F,
                                   K=args.K, d_drop=0.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "spatial": jax.random.PRNGKey(4)},
        jnp.asarray(X), jnp.asarray(subs))
    out_jax = np.asarray(model.apply(variables, jnp.asarray(X),
                                     jnp.asarray(subs), train=False))

    tm = ref.models.BrainEncoderSeq2Static(args)
    _transplant_encoder(variables["params"], tm, 3)
    tm.eval()
    with torch.no_grad():
        out_ref = tm(_t(X), list(subs)).numpy()
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-3, atol=1e-4)


def test_eegnet_forward_matches_reference(ref, god_geo):
    F1, D, F2, k1, k2, p1, p2 = 4, 2, 8, 10, 4, 2, 4
    args = ns(**dict(
        god_geo,
        window={"start": 0.0, "end": 0.4},
        preprocs={"brain_resample_rate": 160},  # T = 0.4 * 160 = 64
        F1=F1, D=D, F2=F2, k1=k1, k2=k2, p1=p1, p2=p2, dr1=0.25, dr2=0.25))
    T = 64
    B = 6
    rng = np.random.RandomState(3)
    X = rng.randn(B, C, T).astype(np.float32)

    model = EEGNet(num_channels=C, T=T, F1=F1, D=D, F2=F2, k1=k1, k2=k2,
                   p1=p1, p2=p2, out_dim=512)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(X))
    p = variables["params"]
    out_jax = np.asarray(model.apply(variables, jnp.asarray(X), train=False))

    tm = ref.models.EEGNet(args)
    # Literal-code quirk certificate: ``compute_dim`` (models.py:86-94) runs a
    # zeros forward through the BN layers in TRAIN mode during __init__, so
    # every running_var starts at 0.9·1 + 0.1·0 = 0.9 instead of 1.0 (torch
    # momentum 0.1).  Assert the quirk, then reset stats for architecture
    # parity (the polluted stats decay during real training; PARITY dev. 18).
    for bn in (tm.conv1[1], tm.conv2[1], tm.conv3[2]):
        assert float(bn.running_var[0]) == pytest.approx(0.9)
        bn.reset_running_stats()
    with torch.no_grad():
        tm.conv1[0].weight.copy_(_conv2d_w(p["conv1"]["kernel"]))
        tm.conv1[1].weight.copy_(_t(p["bn1"]["scale"]))
        tm.conv1[1].bias.copy_(_t(p["bn1"]["bias"]))
        tm.conv2[0].weight.copy_(_conv2d_w(p["conv2"]["kernel"]))
        tm.conv2[1].weight.copy_(_t(p["bn2"]["scale"]))
        tm.conv2[1].bias.copy_(_t(p["bn2"]["bias"]))
        tm.conv3[0].weight.copy_(_conv2d_w(p["conv3_dw"]["kernel"]))
        tm.conv3[1].weight.copy_(_conv2d_w(p["conv3_pw"]["kernel"]))
        tm.conv3[2].weight.copy_(_t(p["bn3"]["scale"]))
        tm.conv3[2].bias.copy_(_t(p["bn3"]["bias"]))
        # flatten-order mismatch: flax flattens NHWC (t', f2), the reference
        # views NCHW (f2, t') — permute the Dense kernel to the torch order
        Tp = T // p1 // p2
        kcl = np.asarray(p["classifier"]["kernel"])  # (Tp*F2, 512)
        kcl = kcl.reshape(Tp, F2, -1).transpose(1, 0, 2).reshape(F2 * Tp, -1)
        tm.classifier.weight.copy_(_t(kcl.T))
        tm.classifier.bias.copy_(_t(p["classifier"]["bias"]))

    tm.eval()
    with torch.no_grad():
        out_ref = tm(_t(X), list(range(B))).numpy()
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scp", [True, False])
def test_linear_encoder_matches_reference(ref, god_geo, scp):
    # scp=False applies Linear(channel_size) to the LAST axis (models.py:337),
    # which only type-checks when T == channel_size — replicate that setup
    T = 20 if scp else C
    args = ns(**dict(god_geo, channel_size=(C if scp else T), scp=scp))
    B = 5
    rng = np.random.RandomState(4)
    X = rng.randn(B, C, T).astype(np.float32)

    model = LinearEncoder(out_dim=512, scp=scp)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(X))
    p = variables["params"]
    out_jax = np.asarray(model.apply(variables, jnp.asarray(X), train=False))

    tm = ref.models.LinearEncoder(args)
    with torch.no_grad():
        tm.linear.weight.copy_(_t(np.asarray(p["linear"]["kernel"]).T))
        tm.linear.bias.copy_(_t(p["linear"]["bias"]))
    tm.eval()
    with torch.no_grad():
        out_ref = tm(_t(X), list(range(B))).numpy()
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# b. loss / metric parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("impl", ["factored", "normalized"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_clip_loss_value_and_grads_match_reference(ref, impl, reduction):
    B, D = 16, 24
    temp0 = 2.0
    rng = np.random.RandomState(5)
    x = rng.randn(B, D).astype(np.float32)
    y = rng.randn(B, D).astype(np.float32)

    cl = ref.loss.CLIPLoss(ns(reduction=reduction, init_temperature=temp0))
    xt = _t(x).requires_grad_(True)
    yt = _t(y).requires_grad_(True)
    loss_ref = cl(xt, yt)
    loss_ref.backward()

    fn = lambda xa, ya, ta: clip_loss(xa, ya, ta, reduction=reduction, impl=impl)
    loss_jax, grads = jax.value_and_grad(fn, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(y), jnp.float32(temp0))

    assert float(loss_jax) == pytest.approx(float(loss_ref.detach()), rel=1e-5)
    np.testing.assert_allclose(np.asarray(grads[0]), xt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads[1]), yt.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    assert float(grads[2]) == pytest.approx(float(cl.temp.grad[0]), rel=1e-4)


def test_clip_loss_slow_path_matches_reference(ref):
    """fast=False (loss.py:74-84): cosine logits, NO temperature scaling."""
    B, F, T = 8, 6, 10
    rng = np.random.RandomState(6)
    x = rng.randn(B, F, T).astype(np.float32)
    y = rng.randn(B, F, T).astype(np.float32)

    cl = ref.loss.CLIPLoss(ns(reduction="mean", init_temperature=2.0))
    with torch.no_grad():
        loss_ref = float(cl(_t(x), _t(y), fast=False))

    logits = _cosine_logits(_normalize(jnp.asarray(x)), _normalize(jnp.asarray(y)))
    targets = jnp.arange(B)
    loss_jax = (_cross_entropy(logits, targets, "mean")
                + _cross_entropy(logits.T, targets, "mean")) / 2.0
    assert float(loss_jax) == pytest.approx(loss_ref, rel=1e-5)


def test_retrieval_classifier_matches_reference(ref):
    B = 32
    rng = np.random.RandomState(7)
    Z = rng.randn(B, 24).astype(np.float32)
    Y = rng.randn(B, 24).astype(np.float32)

    clf = ref.models.Classifier(ns(normalize_image_features=False))
    top1_ref, top10_ref, top5_ref = clf(_t(Z), _t(Y), top_k=5)

    acc = retrieval_accuracy(jnp.asarray(Z), jnp.asarray(Y), top_ks=(1, 10, 5))
    assert float(acc["top1"]) == pytest.approx(float(top1_ref), abs=1e-6)
    assert float(acc["top10"]) == pytest.approx(float(top10_ref), abs=1e-6)
    assert float(acc["top5"]) == pytest.approx(float(top5_ref), abs=1e-6)


def test_mse_loss_matches_reference(ref):
    B, F, T = 6, 5, 9
    rng = np.random.RandomState(8)
    Y = rng.randn(B, F, T).astype(np.float32)
    Z = rng.randn(B, F, T).astype(np.float32)
    loss_ref = float(ref.loss.MSELoss()(_t(Y), _t(Z)))
    assert float(mse_loss(jnp.asarray(Y), jnp.asarray(Z))) == \
        pytest.approx(loss_ref, rel=1e-6)


# ---------------------------------------------------------------------------
# c. literal certificates for the documented deviations
# ---------------------------------------------------------------------------

def test_same_label_loss_reference_anchor_bug_certificate(ref):
    """PARITY deviation 2, certified against the literal code: the reference
    anchors every pair at ``Z[label]`` (loss.py:30), not ``Z[i]`` — for
    labels [0, 0, 1, 1] that yields pairs (Z0,Z1), (Z0,Z0), (Z1,Z3), (Z1,Z2);
    ours yields the intended (Z0,Z1)×2, (Z2,Z3)×2."""
    rng = np.random.RandomState(9)
    Z = rng.randn(4, 8).astype(np.float32)
    labels = np.array([0, 0, 1, 1])

    loss_ref = float(ref.loss.SameLabelLoss()(_t(Z), labels))
    mse = lambda a, b: float(np.mean((a - b) ** 2))
    expected_ref = np.mean([mse(Z[0], Z[1]), 0.0,
                            mse(Z[1], Z[3]), mse(Z[1], Z[2])])
    assert loss_ref == pytest.approx(expected_ref, rel=1e-6)

    loss_ours = float(same_label_loss(jnp.asarray(Z), jnp.asarray(labels)))
    expected_ours = (mse(Z[0], Z[1]) + mse(Z[2], Z[3])) / 2.0
    assert loss_ours == pytest.approx(expected_ours, rel=1e-5)


@pytest.fixture()
def god_galleries(tmp_path, monkeypatch):
    """MyCLIPLikeClassificationLoss hard-codes ``./data/GOD/*.npy``
    (loss.py:149-157) — fabricate them and chdir."""
    rng = np.random.RandomState(10)
    train = rng.randn(1200, 512).astype(np.float32)
    test = rng.randn(50, 512).astype(np.float32)
    d = tmp_path / "data" / "GOD"
    d.mkdir(parents=True)
    np.save(d / "image_features_train.npy", train)
    np.save(d / "image_features.npy", test)
    monkeypatch.chdir(tmp_path)
    return train, test


def _cls_args(criterion, temp=1.0):
    return ns(criterion=criterion, reduction="mean", temp_trainable=False,
              init_temperature=temp, normalize_image_features=False)


def test_classification_loss_eval_modes_match_reference(ref, god_galleries):
    _, test_gallery = god_galleries
    B = 10
    rng = np.random.RandomState(11)
    x = rng.randn(B, 512).astype(np.float32)
    labels0 = rng.randint(0, 50, B)          # 0-indexed (ours)
    labels1 = torch.tensor(labels0 + 1)       # the reference subtracts 1

    for criterion in ("crossentropy", "similarity_crossentropy"):
        cl = ref.loss.MyCLIPLikeClassificationLoss(_cls_args(criterion))
        with torch.no_grad():
            loss_ref = float(cl(_t(x), labels1, train=False))
        loss_jax = float(clip_like_classification_loss(
            jnp.asarray(x), jnp.asarray(labels0), jnp.asarray(test_gallery),
            jnp.float32(1.0), criterion=criterion, train=False))
        assert loss_jax == pytest.approx(loss_ref, rel=1e-5), criterion

    # binary_crossentropy eval: one-hot BCE.  temp=1 keeps the sigmoid
    # unsaturated (at the config temp 5.1 the logits are ±e^5.1·cos and the
    # clamping conventions differ: torch clamps log at -100, ours clips p)
    cl = ref.loss.MyCLIPLikeClassificationLoss(_cls_args("binary_crossentropy"))
    with torch.no_grad():
        loss_ref = float(cl(_t(x), labels1, train=False))
    loss_jax = float(clip_like_classification_loss(
        jnp.asarray(x), jnp.asarray(labels0), jnp.asarray(test_gallery),
        jnp.float32(1.0), criterion="binary_crossentropy", train=False))
    assert loss_jax == pytest.approx(loss_ref, rel=1e-4)


def test_classification_loss_train_dead_smoothing_certificate(ref, god_galleries):
    """PARITY deviation 7, certified against the literal code: the smoothing
    branch guard ``mode == 'crossentropy' and mode == 'binary_crossentropy'``
    (loss.py:179) is always False, so train-mode targets stay ALL-ZERO —
    crossentropy train loss is exactly 0 (zero gradient), and
    binary_crossentropy train reduces to BCE against all-zero targets."""
    train_gallery, _ = god_galleries
    B = 64  # calculate_smooth_labeling hard-codes a (64, 1200) buffer
    rng = np.random.RandomState(12)
    x = rng.randn(B, 512).astype(np.float32)
    labels1 = torch.tensor(rng.randint(1, 1201, B))

    cl = ref.loss.MyCLIPLikeClassificationLoss(_cls_args("crossentropy"))
    loss_ref = float(cl(_t(x), labels1, train=True).detach())
    assert loss_ref == 0.0

    cl = ref.loss.MyCLIPLikeClassificationLoss(_cls_args("binary_crossentropy"))
    with torch.no_grad():
        loss_ref = float(cl(_t(x), labels1, train=True))
        xn = _t(x) / _t(x).norm(dim=-1, keepdim=True)
        g = _t(train_gallery)
        gn = g / g.norm(dim=-1, keepdim=True)
        p = torch.sigmoid(xn @ gn.T * torch.exp(torch.tensor(1.0)))
        expected = float(torch.nn.functional.binary_cross_entropy(
            p, torch.zeros(B, 1200)))
    assert loss_ref == pytest.approx(expected, rel=1e-6)


def test_classification_loss_similarity_train_degenerates_to_uniform(ref, god_galleries):
    """Literal certificate: ``compute_similarity(gallery, gallery)`` with
    ``CosineSimilarity(dim=-1)`` on two (1200, 512) tensors is the (1200,)
    vector of each row's similarity WITH ITSELF — all ones (loss.py:165-166).
    Train-mode similarity_crossentropy targets are therefore
    softmax(1·e^temp · 1⃗) = uniform for every label.  Ours deviates by
    using the true (G, G) self-similarity matrix (the intended semantics)."""
    B = 64
    rng = np.random.RandomState(13)
    x = rng.randn(B, 512).astype(np.float32)
    labels1 = torch.tensor(rng.randint(1, 1201, B))

    cl = ref.loss.MyCLIPLikeClassificationLoss(_cls_args("similarity_crossentropy"))
    assert cl.similarity_matrix.shape == (1200,)
    assert torch.allclose(cl.similarity_matrix,
                          torch.ones(1200), atol=1e-5)
    with torch.no_grad():
        loss_ref = float(cl(_t(x), labels1, train=True))
        logits, _ = cl(_t(x), labels1, train=True, return_logits=True)
        uniform = torch.full((B, 1200), 1.0 / 1200)
        expected = float(-(uniform * torch.log_softmax(logits, dim=-1))
                         .sum(-1).mean())
    assert loss_ref == pytest.approx(expected, rel=1e-5)


# ---------------------------------------------------------------------------
# gradient parity through the full encoder (train=False forward)
# ---------------------------------------------------------------------------

def test_encoder_clip_gradients_match_reference(ref, god_geo):
    """One fwd+bwd of CLIPLoss(BrainEncoder(X), Y) against the literal
    classes: spatial-attention z and conv_final2 parameter grads agree.
    torch returns complex grads in the ∂L/∂(re, im) convention, matching
    the separate z_re/z_im parameters here."""
    args = _enc_args(god_geo)
    loc = ref.layout.ch_locations_2d(args).numpy()
    B, T = 8, 24
    rng = np.random.RandomState(14)
    X = rng.randn(B, C, T).astype(np.float32)
    Y = rng.randn(B, args.F).astype(np.float32)
    subs = np.array([0, 1, 2, 0, 1, 2, 0, 1])
    temp0 = 2.0

    model = BrainEncoder(loc=loc, num_subjects=3, D1=args.D1, D2=args.D2,
                         F=args.F, K=args.K, d_drop=0.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(5), "spatial": jax.random.PRNGKey(6)},
        jnp.asarray(X), jnp.asarray(subs))

    def loss_fn(params):
        Z = model.apply({"params": params,
                         "batch_stats": variables.get("batch_stats", {})},
                        jnp.asarray(X), jnp.asarray(subs), train=False)
        return clip_loss(Z, jnp.asarray(Y), jnp.float32(temp0))

    loss_jax, g = jax.value_and_grad(loss_fn)(variables["params"])

    tm = ref.models.BrainEncoder(args)
    _transplant_encoder(variables["params"], tm, 3)
    tm.eval()  # eval-mode BN to mirror train=False above
    cl = ref.loss.CLIPLoss(ns(reduction="mean", init_temperature=temp0))
    loss_ref = cl(tm(_t(X), list(subs)), _t(Y))
    loss_ref.backward()

    assert float(loss_jax) == pytest.approx(float(loss_ref.detach()), rel=1e-4)
    zg = tm.subject_block.spatial_attention.z.grad
    np.testing.assert_allclose(
        np.asarray(g["subject_block"]["spatial_attention"]["z_re"]),
        zg.real.numpy(), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g["subject_block"]["spatial_attention"]["z_im"]),
        zg.imag.numpy(), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g["conv_final2"]["kernel"]),
        tm.conv_final2.weight.grad.numpy()[:, :, 0].T, rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# d. convergence anchor with the literal reference classes (slow)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_training_anchor_matches_literal_reference_classes(ref, god_geo):
    """One seed of the accuracy anchor (tests/test_accuracy_parity.py) with
    the REAL reference BrainEncoder + CLIPLoss + torch Adam as the torch
    side: shared transplanted init, same batch schedule, top-10 retrieval on
    a held-out gallery must agree within the established 5-pt gate (which
    absorbs binomial noise on 512 samples; measured diffs ~1-2 pts)."""
    import optax

    from meg_decoding_tpu.train.state import create_train_state
    from meg_decoding_tpu.train.steps import (CollateConfig, LossConfig,
                                              make_train_step)

    D1, D2, F, K, NSUB = 16, 24, 24, 4, 2
    N_TRAIN, N_TEST, BATCH, STEPS, LR, TEMP0 = 4096, 512, 64, 1200, 1e-3, 2.0
    T = 32

    args = _enc_args(god_geo, num_subjects=NSUB, D1=D1, D2=D2, F=F, K=K)
    loc = ref.layout.ch_locations_2d(args).numpy()

    seed = 42
    rng = np.random.RandomState(seed)
    W_plant = (rng.randn(C, F) * 2.0).astype(np.float32)

    def planted(n):
        X = rng.randn(n, C, T).astype(np.float32)
        Y = (X.mean(-1) @ W_plant) + 0.05 * rng.randn(n, F).astype(np.float32)
        return X, Y.astype(np.float32), rng.randint(0, NSUB, n)

    Xtr, Ytr, Str = planted(N_TRAIN)
    Xte, Yte, Ste = planted(N_TEST)
    batch_idx = [rng.randint(0, N_TRAIN, BATCH) for _ in range(STEPS)]

    model = BrainEncoder(loc=loc, num_subjects=NSUB, D1=D1, D2=D2, F=F, K=K,
                         d_drop=0.0)
    opt = optax.adam(LR)
    state = create_train_state(
        model, opt,
        (jnp.asarray(Xtr[:BATCH]), jnp.asarray(Ytr[:BATCH]),
         jnp.asarray(Str[:BATCH])),
        jax.random.PRNGKey(seed), init_temperature=TEMP0)

    torch.manual_seed(seed)
    tm = ref.models.BrainEncoder(args)
    _transplant_encoder(state.params["model"], tm, NSUB)
    cl = ref.loss.CLIPLoss(ns(reduction="mean", init_temperature=TEMP0))
    topt = torch.optim.Adam(list(tm.parameters()) + list(cl.parameters()),
                            lr=LR)

    step = make_train_step(model, opt, LossConfig(kind="clip"),
                           CollateConfig(enabled=False), donate=False)
    jax_losses, ref_losses = [], []
    for i in range(STEPS):
        b = batch_idx[i]
        state, m = step(state, jnp.asarray(Xtr[b]), jnp.asarray(Ytr[b]),
                        jnp.asarray(Str[b]))
        jax_losses.append(float(m["loss"]))
    tm.train()
    for i in range(STEPS):
        b = batch_idx[i]
        topt.zero_grad()
        loss = cl(tm(_t(Xtr[b]), list(Str[b])), _t(Ytr[b]))
        loss.backward()
        topt.step()
        ref_losses.append(float(loss.detach()))

    # transplant sanity: the very first loss must match to float tolerance
    assert jax_losses[0] == pytest.approx(ref_losses[0], rel=1e-3)

    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats}
    Z = np.asarray(model.apply(variables, jnp.asarray(Xte), jnp.asarray(Ste),
                               train=False))
    tm.eval()
    with torch.no_grad():
        Zt = tm(_t(Xte), list(Ste)).numpy()

    def top10(Zs, Ys):
        Zs = Zs / np.linalg.norm(Zs, axis=1, keepdims=True)
        Yn = Ys / np.linalg.norm(Ys, axis=1, keepdims=True)
        ranks = (-(Zs @ Yn.T)).argsort(1)
        return float(np.mean([i in ranks[i, :10] for i in range(len(Zs))]))

    acc_jax, acc_ref = top10(Z, Yte), top10(Zt, Yte)
    print(f"literal-reference anchor: jax top10={acc_jax:.4f} "
          f"reference top10={acc_ref:.4f} diff={abs(acc_jax-acc_ref):.4f}")
    assert acc_jax > 0.30 and acc_ref > 0.30, (acc_jax, acc_ref)
    assert abs(acc_jax - acc_ref) <= 0.05, (acc_jax, acc_ref)
