"""JAX ResNet x-vector net parity vs the reference PyTorch definition
(resnet.py:78-135), via torch state_dict conversion on random weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import load_ref_module  # noqa: E402
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
