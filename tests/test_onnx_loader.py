"""ONNX x-vector weight path, tested against REAL torch-exported graphs.

The reference's live extractor runs `final.onnx` (a torch export of the VBx
ResNet, reference vbx_segmenter.py:249-266).  These tests torch.onnx.export
the reference resnet.py architecture in-env (small configs), parse the files
with our first-party protobuf reader, map weights by graph topology, and
assert embedding parity against torch eval — covering exactly the machinery
that will load the released final.onnx.  Both export styles are exercised:
constant-folded (BN fused into Conv bias — the default for eval exports, and
what release files typically look like) and unfused (explicit
BatchNormalization nodes).  Initializer names are opaque ``onnx::Conv_*``
strings in folded exports, which is why the mapping is name-free.
"""

import importlib.util
import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from inaspeechsegmenter_tpu.models.onnx_reader import read_model  # noqa: E402
from inaspeechsegmenter_tpu.models.resnet import ResNetXVector  # noqa: E402
from inaspeechsegmenter_tpu.vfs import _load_resnet_onnx  # noqa: E402


def _ref_resnet_module():
    spec = importlib.util.spec_from_file_location(
        "refmod_resnet", "/root/reference/inaSpeechSegmenter/resnet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _export_onnx(model, x, fold=True):
    """torch.onnx.export without the `onnx` package.

    The legacy exporter builds the complete ModelProto bytes itself and only
    imports `onnx` for an onnx-script post-pass (a no-op for plain models);
    bypass that single step so the export works in this env.
    """
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom: \
        model_bytes
    try:
        buf = io.BytesIO()
        torch.onnx.export(model, x, buf, opset_version=12, dynamo=False,
                          do_constant_folding=fold)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    return buf.getvalue()


def _small_torch_model(blocks, mc, feat, embed, seed=7):
    ref = _ref_resnet_module()
    tmodel = ref.ResNet(ref.Bottleneck, list(blocks), m_channels=mc,
                        feat_dim=feat, embed_dim=embed)
    tmodel.eval()
    # randomize BN stats so eval-mode parity is non-trivial
    g = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(1.0 + torch.rand(m.running_var.shape,
                                                 generator=g))
    return tmodel, g


@pytest.mark.parametrize("fold", [True, False])
@pytest.mark.parametrize("blocks,mc,feat,embed", [
    ((1, 1, 1, 1), 8, 16, 32),
    ((2, 1, 1, 2), 4, 24, 16),
])
def test_onnx_topology_loader_matches_torch(tmp_path, blocks, mc, feat,
                                            embed, fold):
    tmodel, g = _small_torch_model(blocks, mc, feat, embed)
    x = torch.randn(2, feat, 50, generator=g)
    with torch.no_grad():
        # reference forward uses unsqueeze_ in-place: pass a clone
        want = tmodel(x.clone()).numpy()

    path = tmp_path / "small.onnx"
    path.write_bytes(_export_onnx(tmodel, x.clone(), fold=fold))

    net = ResNetXVector("bottleneck", blocks, m_channels=mc, feat_dim=feat,
                        embed_dim=embed)
    params = _load_resnet_onnx(net, str(path))
    got = np.asarray(net(params, x.numpy()))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_onnx_reader_roundtrips_graph(tmp_path):
    """Reader surfaces the node stream and raw initializer tensors."""
    tmodel, _ = _small_torch_model((1, 1, 1, 1), 8, 16, 32)
    n_convs = 1 + 4 * 3 + 4  # stem + 4 blocks x 3 + 4 stage shortcuts

    folded = read_model(_export_onnx(tmodel, torch.randn(1, 16, 40)))
    ops = [n.op_type for n in folded.nodes]
    assert ops.count("Conv") == n_convs
    assert ops.count("BatchNormalization") == 0  # fused into conv biases
    assert ops.count("Gemm") == 1

    unfused = read_model(_export_onnx(tmodel, torch.randn(1, 16, 40),
                                      fold=False))
    ops = [n.op_type for n in unfused.nodes]
    assert ops.count("Conv") == n_convs
    assert ops.count("BatchNormalization") == n_convs

    # weight tensors resolvable through node inputs, whatever their names
    conv0 = next(n for n in folded.nodes if n.op_type == "Conv")
    w = folded.initializers[conv0.inputs[1]]
    assert w.shape == (8, 1, 3, 3) and w.dtype == np.float32


def test_onnx_loader_rejects_wrong_architecture(tmp_path):
    tmodel, _ = _small_torch_model((1, 1, 1, 1), 8, 16, 32)
    path = tmp_path / "a.onnx"
    path.write_bytes(_export_onnx(tmodel, torch.randn(1, 16, 40)))
    wrong = ResNetXVector("bottleneck", (2, 1, 1, 1), m_channels=8,
                          feat_dim=16, embed_dim=32)
    with pytest.raises(ValueError):
        _load_resnet_onnx(wrong, str(path))
