"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  Reference modules from /root/reference are imported *individually*
(bypassing the package __init__, which needs TensorFlow/skimage) and used as
numeric oracles for parity tests.
"""

import importlib.util
import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("ISS_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags +
                               " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may pre-register an 'axon' TPU platform that wins over the
# env var; force the platform through the config API as well.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache: the suite's cost is dominated by XLA
# compiles of the big fused/vmapped programs, which are identical across
# runs — caching them makes iteration runs several times faster.
# ISS_TEST_JAX_CACHE=0 disables (e.g. to measure cold-compile coverage).
if os.environ.get("ISS_TEST_JAX_CACHE", "1") != "0":
    from inaspeechsegmenter_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

REF_DIR = "/root/reference/inaSpeechSegmenter"
MEDIA_DIR = "/root/reference/media"


def load_ref_module(name):
    """Import a single reference module file as an oracle."""
    spec = importlib.util.spec_from_file_location(
        f"refmod_{name}", os.path.join(REF_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_sidekit():
    return load_ref_module("sidekit_mfcc")


@pytest.fixture(scope="session")
def ref_viterbi():
    return load_ref_module("pyannote_viterbi")


@pytest.fixture(scope="session")
def ref_viterbi_utils():
    return load_ref_module("viterbi_utils")


@pytest.fixture(scope="session")
def ref_features_vbx():
    return load_ref_module("features_vbx")


@pytest.fixture(scope="session")
def media_dir():
    return MEDIA_DIR


@pytest.fixture(scope="session")
def musanmix_sig():
    from inaspeechsegmenter_tpu.audio import read_wav

    sig, sr = read_wav(os.path.join(MEDIA_DIR, "musanmix.wav"), dtype="float32")
    assert sr == 16000
    return sig


@pytest.fixture(scope="session")
def synthetic_model_dir(tmp_path_factory):
    """Install synthetic CNN/MLP weights and point the registry at them."""
    from inaspeechsegmenter_tpu.models.synthetic import install_synthetic_models

    d = tmp_path_factory.mktemp("models")
    install_synthetic_models(str(d), size="small")
    old = os.environ.get("ISS_TPU_MODEL_DIR")
    os.environ["ISS_TPU_MODEL_DIR"] = str(d)
    yield str(d)
    if old is None:
        os.environ.pop("ISS_TPU_MODEL_DIR", None)
    else:
        os.environ["ISS_TPU_MODEL_DIR"] = old


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


_TPU_PROBE = {}


def require_live_tpu(timeout=90):
    """Probe the session-default platform (outside the suite's CPU pin) in
    a subprocess: skip if no TPU is visible OR the tunneled link is
    stalled (it stalls for tens of minutes at a time — an on-TPU test
    would otherwise burn its whole subprocess timeout before failing).
    The result is cached for the session."""
    import subprocess

    if "res" not in _TPU_PROBE:
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        code = ("import sys, jax, jax.numpy as jnp\n"
                "if jax.devices()[0].platform != 'tpu':\n"
                "    sys.exit(77)\n"
                "x = jnp.ones((256, 256))\n"
                "print(float((x @ x)[0, 0]))\n")
        try:
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True,
                               timeout=timeout)
            _TPU_PROBE["res"] = ("no-tpu" if r.returncode == 77 else
                                 "ok" if r.returncode == 0 else
                                 f"probe rc={r.returncode}")
        except subprocess.TimeoutExpired:
            _TPU_PROBE["res"] = "stalled"
    res = _TPU_PROBE["res"]
    if res == "no-tpu":
        pytest.skip("no TPU visible outside the test platform pin")
    elif res == "stalled":
        pytest.skip("TPU link stalled (probe matmul timed out)")
    elif res != "ok":
        pytest.skip(f"TPU probe failed ({res})")


@pytest.fixture()
def live_tpu():
    """Skip unless a real TPU is visible AND its link answers a matmul."""
    require_live_tpu()
