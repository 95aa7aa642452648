"""JAX ResNet x-vector net parity vs the reference PyTorch definition
(resnet.py:78-135), via torch state_dict conversion on random weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import load_ref_module  # noqa: E402
from inaspeechsegmenter_tpu.models.resnet import ResNetXVector  # noqa: E402


def _randomize_bn(model, gen):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 2.0, generator=gen)
            m.weight.data.normal_(1, 0.2, generator=gen)
            m.bias.data.normal_(0, 0.2, generator=gen)


@pytest.mark.parametrize("blocks,block_cls", [
    ((1, 1, 1, 1), "bottleneck"),
    ((2, 2, 2, 2), "basic"),
])
def test_resnet_parity_small(blocks, block_cls):
    ref_resnet = load_ref_module("resnet")
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    block = (ref_resnet.Bottleneck if block_cls == "bottleneck"
             else ref_resnet.BasicBlock)
    tmodel = ref_resnet.ResNet(block, list(blocks), m_channels=8,
                               feat_dim=64, embed_dim=32)
    _randomize_bn(tmodel, gen)
    tmodel.eval()

    ours = ResNetXVector(block_cls, blocks, m_channels=8, feat_dim=64,
                         embed_dim=32)
    params = ours.params_from_torch_state(tmodel.state_dict())

    x = np.random.default_rng(2).standard_normal((2, 64, 144)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x.copy())).numpy()
    out = np.asarray(ours(params, x))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-3)


def test_resnet101_shapes():
    """Full ResNet101 config builds and produces (B, 256) embeddings."""
    net = ResNetXVector("bottleneck", (3, 4, 23, 3), 32, 64, 256)
    params = net.init_params(seed=0)
    x = np.random.default_rng(0).standard_normal((1, 64, 48)).astype(np.float32)
    out = np.asarray(net(params, x))
    assert out.shape == (1, 256)
    assert np.isfinite(out).all()


def test_checkpoint_roundtrip(tmp_path):
    from inaspeechsegmenter_tpu.vfs import save_resnet_npz, _load_resnet_npz

    net = ResNetXVector("bottleneck", (1, 1, 1, 1), 8, 64, 32)
    params = net.init_params(seed=5)
    p = str(tmp_path / "r.npz")
    save_resnet_npz(p, params)
    again = _load_resnet_npz(p)
    x = np.random.default_rng(1).standard_normal((2, 64, 100)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(net(params, x)),
                                  np.asarray(net(again, x)))


@pytest.mark.parametrize("block_cls,blocks", [("bottleneck", (1, 1, 1, 1)),
                                              ("basic", (1, 1, 1, 1))])
def test_masked_forward_equals_exact_length(block_cls, blocks):
    """forward(n_valid) on a zero-padded window == exact-length forward,
    for the whole tail-length range (the bounded-compile tail path,
    vfs.py get_embedding_masked). Exact up to float reassociation: masking
    before every 3x3 conv reproduces the exact-length program's conv
    padding (models/resnet.py _tmask)."""
    net = ResNetXVector(block_cls, blocks, m_channels=8, feat_dim=64,
                        embed_dim=32)
    params = net.init_params(seed=9)
    rng = np.random.default_rng(4)
    full = rng.standard_normal((1, 64, 144)).astype(np.float32)
    for length in (10, 11, 100, 143, 144):
        exact = np.asarray(net(params, full[:, :, :length]))
        padded = full.copy()
        padded[:, :, length:] = 0.0
        masked = np.asarray(net._jit(params, padded,
                                     np.asarray([length], np.int32)))
        np.testing.assert_allclose(masked, exact, rtol=1e-4, atol=1e-4)


def test_masked_forward_per_sample_lengths():
    """n_valid is per-sample: a batch mixing lengths matches per-window
    exact-length forwards."""
    net = ResNetXVector("bottleneck", (1, 1, 1, 1), 8, 64, 32)
    params = net.init_params(seed=2)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((3, 64, 144)).astype(np.float32)
    lengths = np.asarray([144, 37, 90], np.int32)
    for b, n in enumerate(lengths):
        x[b, :, n:] = 0.0
    out = np.asarray(net._jit(params, x, lengths))
    for b, n in enumerate(lengths):
        exact = np.asarray(net(params, x[b:b + 1, :, :n]))
        np.testing.assert_allclose(out[b:b + 1], exact, rtol=1e-4, atol=1e-4)


def test_masked_tail_single_program():
    """Distinct tail lengths share ONE compiled masked program (the whole
    point: a fresh full-ResNet compile per tail length is 20-40 s on the
    tunneled TPU host, recurring across a corpus)."""
    from inaspeechsegmenter_tpu.vfs import JaxResnetExtractor, STEP, WINLEN

    net = ResNetXVector("bottleneck", (1, 1, 1, 1), 8, 64, 32)
    ext = JaxResnetExtractor(params=net.init_params(seed=1), net=net)
    rng = np.random.default_rng(6)
    before = None
    # constant full-window count (2 windows for t in 169..192, so the pow2
    # batch bucket stays fixed) with five distinct tail lengths
    for t in (170, 175, 181, 187, 192):
        fea = rng.standard_normal((t, 64)).astype(np.float32)
        xv = ext("b", fea, t / 100.0)
        start = max(range(0, t - WINLEN, STEP))
        assert xv[-1][0] == f"b_{start + STEP:08}-{t:08}"
        size = net._jit._cache_size()
        if before is not None:
            assert size == before, "tail length recompiled the ResNet"
        before = size
