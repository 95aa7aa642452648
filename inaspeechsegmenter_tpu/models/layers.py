"""Pure-JAX inference implementations of the Keras layer vocabulary.

The reference runs its CNNs/MLPs through the TensorFlow/Keras C++ runtime
(reference segmenter.py:131,163; vbx_segmenter.py:122).  Here each layer type
is a pure function over a params list, assembled into a jit-compiled forward
pass by :mod:`.keras_h5`.  Layout is NHWC (Keras channels_last) so imported
kernels apply without transposition; XLA re-layouts for the MXU internally.

Only inference semantics are implemented (BatchNorm uses moving statistics,
Dropout is identity) — matching `keras.Model.predict`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# CNN matmul/conv precision (ISS_CNN_PRECISION):
#   highest           — exact f32 (6-pass); the bit-parity reference mode
#                       and the CPU default (where it is also the fast
#                       path);
#   high              — bf16 3-pass; the TPU default: measured ZERO
#                       frame-label diffs vs `highest` over 34,455 frames
#                       of mixed real+synthetic audio on v5e (full-size
#                       weights), well inside the <=0.1% budget, at ~2x
#                       the CNN throughput (single-pass bf16 measured
#                       3/1024 argmax flips, DEFAULT 0.5% — not default);
#   default / bf16    — single-pass bf16: 2.9x faster on the patch CNN
#                       (63 ms vs 174 ms per 43k patches on v5e) for
#                       deployments that accept ~1% boundary wobble.
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    "bf16": jax.lax.Precision.DEFAULT,
}


def resolve_precision(mode, table, env_name):
    """Shared env-knob resolution: explicit unknown values fail fast with a
    clear message (not a KeyError deep inside a jit trace, and not a silent
    fallback that would run a different precision than requested)."""
    prec = table.get(mode.lower())
    if prec is None:
        raise ValueError(
            f"{env_name}={mode!r} is not a known precision; expected one of "
            f"{sorted(table)}")
    return prec


def cnn_precision():
    mode = os.environ.get("ISS_CNN_PRECISION")
    if mode is None:
        mode = "high" if jax.default_backend() == "tpu" else "highest"
    return resolve_precision(mode, _PRECISIONS, "ISS_CNN_PRECISION")


def _activation(name, x):
    if name is None or name == "linear":
        return x
    if name == "relu":
        return jax.nn.relu(x)
    if name == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "elu":
        return jax.nn.elu(x)
    if name == "selu":
        return jax.nn.selu(x)
    if name == "gelu":
        return jax.nn.gelu(x)
    if name == "softplus":
        return jax.nn.softplus(x)
    if name == "exponential":
        return jnp.exp(x)
    if name == "hard_sigmoid":
        return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)
    if name == "swish" or name == "silu":
        return jax.nn.silu(x)
    raise NotImplementedError(f"activation {name!r}")


def _pair(v):
    if isinstance(v, (list, tuple)):
        return tuple(int(e) for e in v)
    return (int(v), int(v))


def _conv2d_cin1(x, kernel, padding):
    """Single-input-channel conv as shifted-window accumulation.

    XLA's conv on TPU pads the cin=1 contraction onto the MXU and wastes
    ~90% of it (measured: the stem conv was 2/3 of total patch-CNN time);
    unrolling the k*k taps as broadcasted multiply-adds runs on the VPU at
    full rate.  Stride-1 only; exact f32 (different summation order than
    conv_general, same accuracy class)."""
    kh, kw, _, cout = kernel.shape
    b, h, w, _ = x.shape
    xs = x[..., 0]
    if padding == "SAME":
        ph0, ph1 = (kh - 1) // 2, kh // 2
        pw0, pw1 = (kw - 1) // 2, kw // 2
        xs = jnp.pad(xs, ((0, 0), (ph0, ph1), (pw0, pw1)))
        oh, ow = h, w
    else:  # VALID
        oh, ow = h - kh + 1, w - kw + 1
    out = None
    for dy in range(kh):
        for dx in range(kw):
            term = xs[:, dy:dy + oh, dx:dx + ow, None] * kernel[dy, dx, 0, :]
            out = term if out is None else out + term
    return out


def conv2d(cfg, params, x):
    kernel = params[0]  # (kh, kw, cin, cout)
    strides = _pair(cfg.get("strides", 1))
    padding = cfg.get("padding", "valid").upper()
    dilation = _pair(cfg.get("dilation_rate", 1))
    if (x.shape[-1] == 1 and strides == (1, 1) and dilation == (1, 1)
            and kernel.shape[0] * kernel.shape[1] <= 25
            and padding in ("SAME", "VALID")):
        out = _conv2d_cin1(x, kernel, padding)
    else:
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=strides, padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=cnn_precision())
    if cfg.get("use_bias", True):
        out = out + params[1]
    return _activation(cfg.get("activation"), out)


def depthwise_conv2d(cfg, params, x):
    kernel = params[0]  # (kh, kw, cin, depth_multiplier)
    kh, kw, cin, dm = kernel.shape
    strides = _pair(cfg.get("strides", 1))
    padding = cfg.get("padding", "valid").upper()
    out = jax.lax.conv_general_dilated(
        x, kernel.reshape(kh, kw, 1, cin * dm),
        window_strides=strides, padding=padding,
        feature_group_count=cin,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=cnn_precision())
    if cfg.get("use_bias", True):
        out = out + params[1]
    return _activation(cfg.get("activation"), out)


def conv1d(cfg, params, x):
    kernel = params[0]  # (kw, cin, cout)
    strides = (int(cfg.get("strides", [1])[0]) if isinstance(cfg.get("strides", 1), (list, tuple))
               else int(cfg.get("strides", 1)),)
    padding = cfg.get("padding", "valid").upper()
    dil = cfg.get("dilation_rate", 1)
    dil = int(dil[0]) if isinstance(dil, (list, tuple)) else int(dil)
    if padding == "CAUSAL":
        # Keras causal = left-pad by (kw-1)*dilation then VALID
        padding = [((kernel.shape[0] - 1) * dil, 0)]
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        rhs_dilation=(dil,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=cnn_precision())
    if cfg.get("use_bias", True):
        out = out + params[1]
    return _activation(cfg.get("activation"), out)


def dense(cfg, params, x):
    out = jnp.dot(x, params[0], precision=cnn_precision())
    if cfg.get("use_bias", True):
        out = out + params[1]
    return _activation(cfg.get("activation"), out)


def batch_norm(cfg, params, x):
    # params ordered gamma, beta, moving_mean, moving_variance with scale
    # and center flags controlling presence
    scale = cfg.get("scale", True)
    center = cfg.get("center", True)
    i = 0
    gamma = params[i] if scale else None
    i += 1 if scale else 0
    beta = params[i] if center else None
    i += 1 if center else 0
    mean, var = params[i], params[i + 1]
    eps = cfg.get("epsilon", 1e-3)
    axis = cfg.get("axis", -1)
    if isinstance(axis, (list, tuple)):
        axis = axis[0]
    # reshape stats to broadcast along `axis`
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    inv = jax.lax.rsqrt(var.reshape(shape) + eps)
    out = (x - mean.reshape(shape)) * inv
    if gamma is not None:
        out = out * gamma.reshape(shape)
    if beta is not None:
        out = out + beta.reshape(shape)
    return out


def _pool2d(cfg, x, reducer, init):
    pool = _pair(cfg.get("pool_size", 2))
    strides = _pair(cfg.get("strides") or cfg.get("pool_size", 2))
    padding = cfg.get("padding", "valid").upper()
    return jax.lax.reduce_window(
        x, init, reducer,
        window_dimensions=(1,) + pool + (1,),
        window_strides=(1,) + strides + (1,),
        padding=padding)


def max_pool2d(cfg, params, x):
    return _pool2d(cfg, x, jax.lax.max, -jnp.inf)


def avg_pool2d(cfg, params, x):
    pool = _pair(cfg.get("pool_size", 2))
    summed = _pool2d(cfg, x, jax.lax.add, 0.0)
    if cfg.get("padding", "valid").upper() == "SAME":
        # Keras AveragePooling2D excludes padded cells from the denominator;
        # count valid elements per window with a same-shaped ones-reduce.
        ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
        count = _pool2d(cfg, ones, jax.lax.add, 0.0)
        return summed / count
    return summed / (pool[0] * pool[1])


def global_avg_pool2d(cfg, params, x):
    out = jnp.mean(x, axis=(1, 2), keepdims=cfg.get("keepdims", False))
    return out


def global_max_pool2d(cfg, params, x):
    return jnp.max(x, axis=(1, 2), keepdims=cfg.get("keepdims", False))


def flatten(cfg, params, x):
    return x.reshape(x.shape[0], -1)


def reshape(cfg, params, x):
    return x.reshape((x.shape[0],) + tuple(cfg["target_shape"]))


def permute(cfg, params, x):
    dims = (0,) + tuple(cfg["dims"])
    return jnp.transpose(x, dims)


def zero_padding2d(cfg, params, x):
    p = cfg.get("padding", 1)
    if isinstance(p, int):
        pads = ((p, p), (p, p))
    else:
        pads = tuple(_pair(e) for e in p)
    return jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))


def activation(cfg, params, x):
    return _activation(cfg.get("activation"), x)


def relu_layer(cfg, params, x):
    # `is not None`: max_value=0.0 is a valid (constant-zero) clamp
    if cfg.get("max_value") is not None:
        x = jnp.minimum(x, cfg["max_value"])
    neg = cfg.get("negative_slope", 0.0) or 0.0
    thr = cfg.get("threshold", 0.0) or 0.0
    return jnp.where(x >= thr, x, neg * (x - thr))


def leaky_relu(cfg, params, x):
    alpha = cfg.get("alpha", cfg.get("negative_slope", 0.3))
    return jnp.where(x >= 0, x, alpha * x)


def softmax_layer(cfg, params, x):
    return jax.nn.softmax(x, axis=cfg.get("axis", -1))


def identity(cfg, params, x):
    return x


def add(cfg, params, xs):
    out = xs[0]
    for e in xs[1:]:
        out = out + e
    return out


def concatenate(cfg, params, xs):
    return jnp.concatenate(xs, axis=cfg.get("axis", -1))


def multiply(cfg, params, xs):
    out = xs[0]
    for e in xs[1:]:
        out = out * e
    return out


# single-input layers: cfg, params, x -> y
LAYER_FNS = {
    "Conv2D": conv2d,
    "DepthwiseConv2D": depthwise_conv2d,
    "Conv1D": conv1d,
    "Dense": dense,
    "BatchNormalization": batch_norm,
    "MaxPooling2D": max_pool2d,
    "AveragePooling2D": avg_pool2d,
    "GlobalAveragePooling2D": global_avg_pool2d,
    "GlobalMaxPooling2D": global_max_pool2d,
    "Flatten": flatten,
    "Reshape": reshape,
    "Permute": permute,
    "ZeroPadding2D": zero_padding2d,
    "Activation": activation,
    "ReLU": relu_layer,
    "LeakyReLU": leaky_relu,
    "Softmax": softmax_layer,
    "Dropout": identity,
    "SpatialDropout1D": identity,
    "SpatialDropout2D": identity,
    "GaussianNoise": identity,
    "GaussianDropout": identity,
    "ActivityRegularization": identity,
    "InputLayer": identity,
}

# multi-input layers: cfg, params, [x...] -> y
MERGE_FNS = {
    "Add": add,
    "Concatenate": concatenate,
    "Multiply": multiply,
}
