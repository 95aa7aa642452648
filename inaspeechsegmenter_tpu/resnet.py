"""Compatibility alias: the reference defines its x-vector architecture in
`inaSpeechSegmenter.resnet` (resnet.py:78-135, torch; dormant there — the
live path is the equivalent ONNX graph).  Here the live path IS this
architecture, implemented in JAX (`models/resnet.py`); this module exposes
the reference's constructor name."""

from .models.resnet import ResNetXVector

__all__ = ["ResNet101", "ResNetXVector"]


def ResNet101(feat_dim=64, embed_dim=256, squeeze_excitation=False):
    """The VBx ResNet101 x-vector network (Bottleneck [3,4,23,3],
    m_channels=32, mean+std statistical pooling), as a JAX module."""
    if squeeze_excitation:
        raise NotImplementedError(
            "squeeze_excitation is not part of the released VBx model")
    return ResNetXVector("bottleneck", (3, 4, 23, 3), 32, feat_dim, embed_dim)
