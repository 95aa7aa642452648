"""JAX ResNet x-vector network (VBx architecture).

Native JAX implementation of the architecture the reference defines in
PyTorch but runs via an equivalent ONNX graph (reference resnet.py:78-135,
vbx_segmenter.py:249-266): conv 3x3 stem (m_channels=32), four stages of
Bottleneck [3,4,23,3] blocks with strides 1/2/2/2 (ResNet101), mean+std
statistical pooling over time, and a Linear projection to embed_dim=256.
BasicBlock variants are supported for capability parity.

Layout: input (B, feat_dim, T) mel features; internally NHWC with H=frequency
and W=time so convs hit the MXU without layout games.  Inference-only
(BatchNorm uses running stats) — the reference pipeline is inference-only.

Weights load from a PyTorch checkpoint (`raw_81.pth`, torch available
CPU-side) or from the released `final.onnx` via the first-party protobuf
reader (models/onnx_reader.py; weights mapped by graph topology, no
`onnx`/`onnxruntime` dependency) — or random init for testing.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

import os

# x-vector conv/matmul precision ladder (ISS_XVEC_PRECISION), mirroring the
# CNN ladder in models/layers.py.  Measured on v5e, (256, 64, 144) batch
# through the full ResNet101: `highest` (exact f32) 166 ms, `high` (bf16
# 3-pass) 131 ms at ~2e-3 relative embedding error, `fast` (single-pass
# bf16) 99 ms at ~5e-2.  Unlike the patch CNN (where bf16 tripled MXU
# throughput), this network is layout/bandwidth-bound at these channel
# counts, so `high` buys only ~1.3x — not worth a lossy default: the
# default is exact `highest` everywhere; `high`/`fast` are opt-in
# throughput tiers.  Read at trace time: set the env var before the first
# forward.
_XPREC = {"highest": jax.lax.Precision.HIGHEST,
          "high": jax.lax.Precision.HIGH,
          "fast": jax.lax.Precision.DEFAULT,
          "bf16": jax.lax.Precision.DEFAULT,
          "default": jax.lax.Precision.DEFAULT}


def xvec_precision():
    from .layers import resolve_precision

    mode = os.environ.get("ISS_XVEC_PRECISION") or "highest"
    return resolve_precision(mode, _XPREC, "ISS_XVEC_PRECISION")


# ---------------------------------------------------------------------------
# functional blocks
# ---------------------------------------------------------------------------

def pooled_freq(feat_dim):
    """Frequency bins surviving the three stride-2 stages: every conv here
    computes ceil(n/2) per stage (3x3 pad-1 and 1x1 VALID alike), so the
    chain is iterated CEILING division — feat_dim // 8 only matches for
    multiples of 8."""
    f = feat_dim
    for _ in range(3):
        f = -(-f // 2)
    return f


def _conv(x, w, stride=1):
    # w: (kh, kw, cin, cout), x: NHWC
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(w.shape[0] // 2, w.shape[0] // 2),
                 (w.shape[1] // 2, w.shape[1] // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=xvec_precision())


def _conv1x1(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=xvec_precision())


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def _tmask(h, valid):
    """Zero time positions >= valid (per-sample).

    Applied immediately before every 3x3 conv in the masked forward: a
    boundary output then reads exactly the zeros that the exact-length
    program's conv padding would provide, so a window padded out to WINLEN
    produces the same embedding as running at its true length (up to float
    reassociation) while every tail length shares ONE compiled program.
    All other ops (1x1 convs — including strided shortcuts, whose output
    grid floor((t-1)/2)+1 matches the 3x3/pad-1 grid — BN, ReLU, adds) are
    pointwise in time, so garbage stays confined to masked positions.
    """
    if valid is None:
        return h
    m = jnp.arange(h.shape[2])[None, :] < valid[:, None]
    return h * m[:, None, :, None].astype(h.dtype)


def _next_valid(valid, stride):
    # conv k=3 / pad=1 (and 1x1 / pad=0) length map: floor((t-1)/s) + 1
    if valid is None or stride == 1:
        return valid
    return (valid - 1) // stride + 1


def _bottleneck(x, p, stride, valid=None):
    out = jax.nn.relu(_bn(_conv1x1(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(_tmask(out, valid), p["conv2"], stride),
                          p["bn2"]))
    out = _bn(_conv1x1(out, p["conv3"]), p["bn3"])
    if "sc_conv" in p:
        sc = _bn(_conv1x1(x, p["sc_conv"], stride), p["sc_bn"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


def _basic(x, p, stride, valid=None):
    out = jax.nn.relu(_bn(_conv(_tmask(x, valid), p["conv1"], stride),
                          p["bn1"]))
    out = _bn(_conv(_tmask(out, _next_valid(valid, stride)), p["conv2"]),
              p["bn2"])
    if "sc_conv" in p:
        sc = _bn(_conv1x1(x, p["sc_conv"], stride), p["sc_bn"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


class ResNetXVector:
    """ResNet x-vector extractor.

    :param block: 'bottleneck' or 'basic'
    :param num_blocks: e.g. [3, 4, 23, 3] for ResNet101
    """

    def __init__(self, block="bottleneck", num_blocks=(3, 4, 23, 3),
                 m_channels=32, feat_dim=64, embed_dim=256):
        self.block = block
        self.num_blocks = tuple(num_blocks)
        self.m_channels = m_channels
        self.feat_dim = feat_dim
        self.embed_dim = embed_dim
        self.expansion = 4 if block == "bottleneck" else 1
        self._jit = jax.jit(self.forward)

    # -- parameter construction -------------------------------------------
    def init_params(self, seed=0):
        rng = np.random.default_rng(seed)

        def he(shape):
            fan_in = int(np.prod(shape[:-1]))
            return (rng.standard_normal(shape) * math.sqrt(2.0 / fan_in)
                    ).astype(np.float32)

        def bn(c):
            return dict(gamma=np.ones(c, np.float32),
                        beta=np.zeros(c, np.float32),
                        mean=np.zeros(c, np.float32),
                        var=np.ones(c, np.float32))

        mc = self.m_channels
        params = dict(conv1=he((3, 3, 1, mc)), bn1=bn(mc))
        in_planes = mc
        for si, (planes_mult, nb, stride) in enumerate(
                zip([1, 2, 4, 8], self.num_blocks, [1, 2, 2, 2])):
            planes = mc * planes_mult
            blocks = []
            for bi in range(nb):
                s = stride if bi == 0 else 1
                p = {}
                if self.block == "bottleneck":
                    p["conv1"] = he((1, 1, in_planes, planes))
                    p["bn1"] = bn(planes)
                    p["conv2"] = he((3, 3, planes, planes))
                    p["bn2"] = bn(planes)
                    p["conv3"] = he((1, 1, planes, planes * 4))
                    p["bn3"] = bn(planes * 4)
                    out_planes = planes * 4
                else:
                    p["conv1"] = he((3, 3, in_planes, planes))
                    p["bn1"] = bn(planes)
                    p["conv2"] = he((3, 3, planes, planes))
                    p["bn2"] = bn(planes)
                    out_planes = planes
                if s != 1 or in_planes != out_planes:
                    p["sc_conv"] = he((1, 1, in_planes, out_planes))
                    p["sc_bn"] = bn(out_planes)
                blocks.append(p)
                in_planes = out_planes
            params[f"layer{si + 1}"] = blocks
        feat = pooled_freq(self.feat_dim) * in_planes * 2
        params["embedding"] = dict(
            w=(rng.standard_normal((feat, self.embed_dim))
               * math.sqrt(1.0 / feat)).astype(np.float32),
            b=np.zeros(self.embed_dim, np.float32))
        return params

    # -- forward ------------------------------------------------------------
    def forward(self, params, x, n_valid=None):
        """x: (B, feat_dim, T) -> (B, embed_dim).

        ``n_valid``: optional (B,) int32 of true time lengths — masked mode:
        time positions >= n_valid[b] are zeroed before every 3x3 conv and
        statistical pooling averages over the true length only, so a window
        zero-padded out to T yields the exact-length embedding (up to float
        reassociation).  This bounds the jit cache for ragged tail windows:
        every tail length {10..144} shares one (B, feat, WINLEN) program
        instead of compiling a fresh ResNet per length.
        """
        valid = None if n_valid is None else jnp.asarray(n_valid, jnp.int32)
        h = x[:, :, :, None]                       # NHWC, H=freq, W=time
        h = jax.nn.relu(_bn(_conv(_tmask(h, valid), params["conv1"]),
                            params["bn1"]))
        block_fn = _bottleneck if self.block == "bottleneck" else _basic
        for si, stride in enumerate([1, 2, 2, 2]):
            for bi, p in enumerate(params[f"layer{si + 1}"]):
                s = stride if bi == 0 else 1
                h = block_fn(h, p, s, valid)
                valid = _next_valid(valid, s)
        # statistical pooling over time (W axis): mean + std
        if valid is None:
            mean = jnp.mean(h, axis=2)             # (B, F', C)
            meansq = jnp.mean(h * h, axis=2)
        else:
            hm = _tmask(h, valid)
            cnt = valid.astype(h.dtype)[:, None, None]
            mean = jnp.sum(hm, axis=2) / cnt
            meansq = jnp.sum(hm * hm, axis=2) / cnt
        std = jnp.sqrt(meansq - mean * mean + 1e-10)
        # torch layout flattens (C, F'); ours is (F', C) — transpose to match
        mean = jnp.transpose(mean, (0, 2, 1)).reshape(h.shape[0], -1)
        std = jnp.transpose(std, (0, 2, 1)).reshape(h.shape[0], -1)
        pooled = jnp.concatenate([mean, std], axis=1)
        return jnp.dot(pooled, params["embedding"]["w"], precision=xvec_precision()) \
            + params["embedding"]["b"]

    def __call__(self, params, x):
        return self._jit(params, x)

    # -- weight import ------------------------------------------------------
    def params_from_torch_state(self, state_dict):
        """Convert a VBx PyTorch checkpoint state_dict to our pytree.

        Mapping: torch conv weight (cout, cin, kh, kw) -> HWIO; BatchNorm
        weight/bias/running_mean/running_var -> gamma/beta/mean/var; embedding
        Linear weight (out, in) -> (in, out).
        """
        def get(name):
            v = state_dict[name]
            return np.asarray(v.detach().cpu().numpy()
                              if hasattr(v, "detach") else v)

        def conv(name):
            return np.transpose(get(name + ".weight"), (2, 3, 1, 0))

        def bn(name):
            return dict(gamma=get(name + ".weight"), beta=get(name + ".bias"),
                        mean=get(name + ".running_mean"),
                        var=get(name + ".running_var"))

        params = dict(conv1=conv("conv1"), bn1=bn("bn1"))
        for si in range(4):
            blocks = []
            bi = 0
            while f"layer{si + 1}.{bi}.conv1.weight" in state_dict:
                pre = f"layer{si + 1}.{bi}"
                p = dict(conv1=conv(pre + ".conv1"), bn1=bn(pre + ".bn1"),
                         conv2=conv(pre + ".conv2"), bn2=bn(pre + ".bn2"))
                if self.block == "bottleneck":
                    p["conv3"] = conv(pre + ".conv3")
                    p["bn3"] = bn(pre + ".bn3")
                if pre + ".shortcut.0.weight" in state_dict:
                    p["sc_conv"] = conv(pre + ".shortcut.0")
                    p["sc_bn"] = bn(pre + ".shortcut.1")
                blocks.append(p)
                bi += 1
            params[f"layer{si + 1}"] = blocks
        w = get("embedding.weight")
        params["embedding"] = dict(w=np.transpose(w, (1, 0)),
                                   b=get("embedding.bias")
                                   if "embedding.bias" in state_dict
                                   else np.zeros(w.shape[0], np.float32))
        return params

    def load_torch_checkpoint(self, path):
        import torch

        # weights_only: the released checkpoint is a plain state_dict; full
        # pickle deserialization of a network-fetched file would allow
        # arbitrary code execution if the cache dir were tampered with.
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except Exception as exc:
            raise ValueError(
                f"{path} is not a plain tensor checkpoint (weights_only "
                f"load failed: {exc}); refusing unpickling of arbitrary "
                "objects from a downloaded file") from exc
        state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
        return self.params_from_torch_state(state)


def ResNet101XVector(feat_dim=64, embed_dim=256):
    return ResNetXVector("bottleneck", (3, 4, 23, 3), 32, feat_dim, embed_dim)
