"""Seeded structure-aware fuzzing of the first-party parsers.

These parsers replace decades-fuzzed native surfaces (libsndfile WAV
parsing, onnxruntime protobuf loading, TF's config deserialization —
SURVEY.md §2 native-dep table), so they get their own fuzz battery: a
valid seed corpus is built in-test, mutated with a FIXED numpy seed
(byte flips, truncation, junk insertion, zeroed ranges, splices, and
structural JSON mutations), and the contract is asserted on every input:

* a clean, typed exception (`ValueError` family — `WavFormatError`,
  `KerasImportError` — per each parser's documented contract), or a
  successful parse; NEVER a raw IndexError/KeyError/struct.error escaping
  the walk, a crash, or a hang;
* the zero-elision codec additionally asserts bit-exact pack/unpack
  roundtrips under randomized silence patterns (its core contract).

Crashers found by earlier runs are pinned as explicit regression inputs
at the bottom.  ISS_FUZZ_N scales the per-parser input count (default
10000; CI keeps the default — each input is microseconds).
"""

import io
import json
import os
import struct

import numpy as np
import pytest

from inaspeechsegmenter_tpu.audio.wav import read_wav, write_wav
from inaspeechsegmenter_tpu.models.keras_h5 import (KerasImportError,
                                                    spec_from_config)
from inaspeechsegmenter_tpu.models.onnx_reader import read_model

N = int(os.environ.get("ISS_FUZZ_N", "10000"))


def _mutate_bytes(rng, blob):
    blob = bytearray(blob)
    op = int(rng.integers(0, 5))
    if op == 0 and blob:                         # flip random bytes
        for _ in range(int(rng.integers(1, 8))):
            blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
    elif op == 1 and blob:                       # truncate
        del blob[int(rng.integers(0, len(blob))):]
    elif op == 2:                                # insert junk
        i = int(rng.integers(0, len(blob) + 1))
        blob[i:i] = rng.integers(0, 256, int(rng.integers(1, 16)),
                                 np.uint8).tobytes()
    elif op == 3 and len(blob) > 4:              # zero a range
        i = int(rng.integers(0, len(blob) - 1))
        j = min(len(blob), i + int(rng.integers(1, 64)))
        blob[i:j] = bytes(j - i)
    elif blob:                                   # splice a slice elsewhere
        i = int(rng.integers(0, len(blob)))
        j = min(len(blob), i + int(rng.integers(1, 32)))
        k = int(rng.integers(0, len(blob)))
        blob[k:k] = blob[i:j]
    return bytes(blob)


# ---------------------------------------------------------------- WAV --

def _wav_corpus():
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(400) * 0.2).astype(np.float32)
    out = []
    for subtype, data in [("PCM_16", sig), ("PCM_32", sig),
                          ("FLOAT", sig), ("DOUBLE", sig.astype(np.float64)),
                          ("PCM_16", np.stack([sig, -sig], 1))]:
        b = io.BytesIO()
        write_wav(b, data, 16000, subtype=subtype)
        out.append(b.getvalue())
    # WAVE_FORMAT_EXTENSIBLE wrapping PCM16, and 8/24-bit hand-built
    pcm = np.clip(np.rint(sig * 32768), -32768, 32767).astype("<i2").tobytes()
    ext_fmt = struct.pack("<HHIIHHHIH", 0xFFFE, 1, 16000, 32000, 2, 16,
                          22, 16, 0x0001) + b"\x00" * 14
    body = b"fmt " + struct.pack("<I", len(ext_fmt)) + ext_fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    out.append(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    for bits, payload in [(8, bytes(range(256))),
                          (24, bytes(rng.integers(0, 256, 300, np.uint8)))]:
        fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * bits // 8,
                          bits // 8, bits)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(payload)) + payload
        out.append(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    return out


def test_fuzz_wav_reader():
    corpus = _wav_corpus()
    rng = np.random.default_rng(1234)
    dtypes = ["float32", "float64", "int16", "int32"]
    for i in range(N):
        blob = corpus[int(rng.integers(0, len(corpus)))]
        for _ in range(int(rng.integers(1, 4))):
            blob = _mutate_bytes(rng, blob)
        try:
            sig, sr = read_wav(blob, dtype=dtypes[i % 4])
            assert isinstance(sig, np.ndarray)
        except ValueError:
            pass  # WavFormatError is a ValueError — the documented contract
        except Exception as e:  # pragma: no cover - pin any finding
            raise AssertionError(
                f"wav fuzz case {i}: {type(e).__name__}: {e}; "
                f"input={blob.hex()}") from e


# --------------------------------------------------------------- ONNX --

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _pb_field(fno, wt, payload):
    key = _varint((fno << 3) | wt)
    if wt == 2:
        return key + _varint(len(payload)) + payload
    return key + payload


def _pb_str(fno, s):
    return _pb_field(fno, 2, s.encode())


def _onnx_corpus():
    """A hand-encoded minimal ModelProto: 1 Conv node, 2 initializers."""
    w = np.arange(8, dtype="<f4").reshape(2, 1, 2, 2)
    b = np.zeros(2, "<f4")

    def tensor(name, arr):
        t = b"".join(_pb_field(1, 0, _varint(d)) for d in arr.shape)
        t += _pb_field(2, 0, _varint(1))               # data_type FLOAT
        t += _pb_str(8, name)
        t += _pb_field(9, 2, arr.tobytes())            # raw_data
        return t

    node = (_pb_str(1, "x") + _pb_str(1, "w") + _pb_str(1, "b")
            + _pb_str(2, "y") + _pb_str(4, "Conv"))
    graph = (_pb_field(1, 2, node)
             + _pb_field(5, 2, tensor("w", w))
             + _pb_field(5, 2, tensor("b", b))
             + _pb_field(11, 2, _pb_str(1, "x"))
             + _pb_field(12, 2, _pb_str(1, "y")))
    model = _pb_field(7, 2, graph)
    g = read_model(model)                              # seed must be valid
    assert [n.op_type for n in g.nodes] == ["Conv"]
    assert set(g.initializers) == {"w", "b"}
    return [model]


def test_fuzz_onnx_reader():
    corpus = _onnx_corpus()
    rng = np.random.default_rng(5678)
    for i in range(N):
        blob = corpus[0]
        for _ in range(int(rng.integers(1, 4))):
            blob = _mutate_bytes(rng, blob)
        try:
            read_model(blob)
        except ValueError:
            pass  # the documented malformed-input contract
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"onnx fuzz case {i}: {type(e).__name__}: {e}; "
                f"input={blob.hex()}") from e


# ------------------------------------------------- Keras config JSON --

def _keras_configs():
    seq = {"class_name": "Sequential", "config": {"layers": [
        {"class_name": "InputLayer",
         "config": {"name": "in", "batch_input_shape": [None, 68, 21, 1]}},
        {"class_name": "Conv2D",
         "config": {"name": "c0", "filters": 4, "kernel_size": [3, 3],
                    "strides": [1, 1], "padding": "same",
                    "activation": "relu", "use_bias": True}},
        {"class_name": "Flatten", "config": {"name": "fl"}},
        {"class_name": "Dense",
         "config": {"name": "out", "units": 3, "activation": "softmax",
                    "use_bias": True}}]}}
    fun = {"class_name": "Functional", "config": {
        "layers": [
            {"class_name": "InputLayer", "name": "in",
             "config": {"name": "in"}, "inbound_nodes": []},
            {"class_name": "Dense", "name": "d1",
             "config": {"name": "d1", "units": 8, "activation": "relu",
                        "use_bias": True},
             "inbound_nodes": [[["in", 0, 0, {}]]]},
            {"class_name": "Dense", "name": "out",
             "config": {"name": "out", "units": 1,
                        "activation": "sigmoid", "use_bias": True},
             "inbound_nodes": [[["d1", 0, 0, {}]]]}],
        "input_layers": [["in", 0, 0]], "output_layers": [["out", 0, 0]]}}
    return [seq, fun]


def _mutate_json(rng, obj):
    """One structural mutation somewhere in the tree (in place)."""
    junk = [None, 0, -1, "", "x", 3.14, [], {}, [[]], {"a": None}, True]

    def nodes(o, acc):
        if isinstance(o, dict):
            acc.append(o)
            for v in o.values():
                nodes(v, acc)
        elif isinstance(o, list):
            acc.append(o)
            for v in o:
                nodes(v, acc)

    acc = []
    nodes(obj, acc)
    tgt = acc[int(rng.integers(0, len(acc)))]
    if isinstance(tgt, dict) and tgt:
        k = list(tgt)[int(rng.integers(0, len(tgt)))]
        op = int(rng.integers(0, 3))
        if op == 0:
            del tgt[k]
        elif op == 1:
            tgt[k] = junk[int(rng.integers(0, len(junk)))]
        else:
            tgt[str(rng.integers(0, 10))] = junk[
                int(rng.integers(0, len(junk)))]
    elif isinstance(tgt, list):
        if tgt and rng.integers(0, 2):
            tgt[int(rng.integers(0, len(tgt)))] = junk[
                int(rng.integers(0, len(junk)))]
        else:
            tgt.append(junk[int(rng.integers(0, len(junk)))])
    return obj


def test_fuzz_keras_config():
    corpus = _keras_configs()
    for c in corpus:                                  # seeds must be valid
        spec = spec_from_config(json.dumps(c))
        assert spec["layers"]
    rng = np.random.default_rng(91011)
    for i in range(N):
        base = json.loads(json.dumps(corpus[i % len(corpus)]))
        if rng.integers(0, 4) == 0:                   # byte-level mutation
            blob = _mutate_bytes(rng, json.dumps(base).encode())
            arg = blob.decode("utf-8", errors="surrogateescape")
        else:                                         # structural mutation
            for _ in range(int(rng.integers(1, 4))):
                _mutate_json(rng, base)
            arg = json.dumps(base)
        try:
            spec_from_config(arg)
        except KerasImportError:
            pass  # the documented malformed-config contract
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"keras config fuzz case {i}: {type(e).__name__}: {e}; "
                f"input={arg[:2000]!r}") from e


# ------------------------------------------------------ upload codec --

def test_fuzz_codec_roundtrip():
    """pack/unpack must be bit-exact under randomized silence patterns,
    and unpack must fail cleanly on inconsistent (buf, nb)."""
    import jax.numpy as jnp

    from inaspeechsegmenter_tpu.dsp import codec

    rng = np.random.default_rng(13)
    for i in range(int(os.environ.get("ISS_FUZZ_CODEC_N", "60"))):
        nb = int(rng.integers(1, 4 * codec.PAGE))
        sig = rng.integers(-3000, 3000, nb * codec.BLOCK).astype(np.int16)
        # randomized digital-silence pattern (whole blocks zeroed)
        zero = rng.random(nb) < rng.random()
        sig.reshape(nb, codec.BLOCK)[zero] = 0
        buf = codec.pack_zero_elide(sig)
        if buf is None:                                # not worth eliding
            continue
        out = np.asarray(codec.unpack_zero_elide(jnp.asarray(buf), nb))
        np.testing.assert_array_equal(out, sig)
    # inconsistent nb: typed failure, not a crash or silent garbage shape
    sig = np.zeros(8 * codec.BLOCK, np.int16)
    sig[:4] = 7
    buf = codec.pack_zero_elide(np.tile(sig, codec.PAGE // 4))
    assert buf is not None
    with pytest.raises((ValueError, TypeError)):
        codec.unpack_zero_elide(jnp.asarray(buf), buf.shape[0] + 1)


# --------------------------------------------- pinned regression inputs --

def test_pinned_wav_lying_sizes():
    """Chunk sizes that lie (huge, zero, odd) and EXTENSIBLE headers too
    short for the SubFormat GUID must all fail or decode cleanly."""
    base = _wav_corpus()[0]
    for mutated in [
        base[:20],                                    # cut inside fmt
        base.replace(b"data", b"dat\x00"),            # no data chunk
        base[:16] + b"\xff\xff\xff\xff" + base[20:],  # huge fmt size
        base[:40] + b"\xff\xff\xff\xff" + base[44:],  # huge data size
    ]:
        try:
            read_wav(mutated)
        except ValueError:
            pass


def test_pinned_onnx_truncated_varint():
    """A varint cut mid-continuation used to escape as IndexError."""
    with pytest.raises(ValueError):
        read_model(b"\x3a\x80")            # field 7 LEN, unterminated length
    with pytest.raises(ValueError):
        read_model(_pb_field(7, 2, b"\x08\xff"))  # graph with cut varint


def test_pinned_onnx_wrong_wire_type():
    """graph.node carried as a varint (wrong wire type) used to escape as
    TypeError('memoryview: a bytes-like object is required') — fuzz case
    5678/20."""
    with pytest.raises(ValueError):
        read_model(_pb_field(7, 2, _pb_field(1, 0, _varint(5))))


def test_pinned_keras_config_shapes():
    """Structural surprises that used to escape as KeyError/TypeError."""
    for bad in [
        {},                                           # no class_name
        {"class_name": "Sequential", "config": None},
        {"class_name": "Sequential", "config": {"layers": [{}]}},
        {"class_name": "Functional", "config": {"layers": None}},
        {"class_name": "Functional",
         "config": {"layers": [{"class_name": "Dense", "config": [],
                                "inbound_nodes": 0}]}},
        [],                                           # not a dict at all
        '{"class_name": "Sequential"',                # cut JSON
    ]:
        with pytest.raises(KerasImportError):
            spec_from_config(bad if not isinstance(bad, str)
                             else bad)
