"""AOT executable persistence (mpc_ilqr_tpu/utils/aot.py).

Replaces the committed-.jax_cache ritual (VERDICT r3 weak 4): compiled
executables are serialized to versioned artifacts with a staleness
fingerprint. These tests pin the round-trip, the fingerprint invalidation
modes (format v3: source digest + arg spec + key — NOT the lowered HLO,
which proved nondeterministic on the remote-TPU infrastructure; see the
module docstring), and the jit_or_aot cold->warm flow on the CPU backend
(the TPU half is exercised by bench.py on hardware).
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from mpc_ilqr_tpu.utils import aot

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# jax.experimental.serialize_executable binds the deserialized executable to
# the client's local devices — it requires the same device topology on load
# as on save (single-chip TPU == single-chip TPU for bench.py). The suite's
# 8-virtual-device mesh (conftest.py) breaks that contract in-process, so
# the execution round-trip runs in a 1-device subprocess.
_ROUNDTRIP = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {root!r})
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from mpc_ilqr_tpu.utils import aot
aot.AOT_DIR = {aot_dir!r}

def fn(d):
    return {{"y": d["a"] @ d["b"] + jnp.sin(d["a"])}}

args = ({{"a": jnp.ones((6, 6)), "b": jnp.eye(6)}},)
spec = aot.args_spec(args, {{}})
compiled = jax.jit(fn).lower(*args).compile()
aot.save("rt", compiled, args=spec)
loaded = aot.load("rt", args=spec)
assert loaded is not None, "fingerprint-valid artifact failed to load"
assert jnp.allclose(loaded(*args)["y"], fn(*args)["y"])

run1, used1, cs1 = aot.jit_or_aot("jw", lambda x: x * 2.0, (jnp.arange(8.0),))
assert not used1 and cs1 > 0.0
run2, used2, _ = aot.jit_or_aot("jw", lambda x: x * 2.0, (jnp.arange(8.0),))
assert used2, "second jit_or_aot call should hit the saved artifact"
assert jnp.allclose(run2(jnp.arange(8.0)), jnp.arange(8.0) * 2.0)

def g(x, n_steps):
    return x * n_steps

r1, u1, _ = aot.jit_or_aot("st", g, (jnp.ones(5),),
                           static_argnames=("n_steps",), n_steps=3)
assert not u1 and jnp.allclose(r1(jnp.ones(5)), 3.0)
r2, u2, _ = aot.jit_or_aot("st", g, (jnp.ones(5),),
                           static_argnames=("n_steps",), n_steps=3)
assert u2 and jnp.allclose(r2(jnp.ones(5)), 3.0)
# A different static kwarg is a different graph: must MISS and recompile.
r3, u3, _ = aot.jit_or_aot("st", g, (jnp.ones(5),),
                           static_argnames=("n_steps",), n_steps=4)
assert not u3 and jnp.allclose(r3(jnp.ones(5)), 4.0)
print("ROUNDTRIP_OK")
"""


@pytest.fixture()
def tmp_aot_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "AOT_DIR", str(tmp_path / "aot"))
    return tmp_path / "aot"


def test_save_load_and_jit_or_aot_single_device(tmp_path):
    script = _ROUNDTRIP.format(root=ROOT, aot_dir=str(tmp_path / "aot"))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run([sys.executable, "-c", script], env=env,
                          capture_output=True, text=True, timeout=240)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ROUNDTRIP_OK" in proc.stdout


def test_load_missing_returns_none(tmp_aot_dir):
    assert aot.load("nope") is None


def test_fingerprint_key_mismatch_invalidates(tmp_aot_dir):
    args = (jnp.ones((4,)),)
    compiled = jax.jit(jnp.cumsum).lower(*args).compile()
    aot.save("keyed", compiled, key="cfgA")
    assert aot.load("keyed", key="cfgA") is not None
    assert aot.load("keyed", key="cfgB") is None


def test_args_spec_mismatch_invalidates(tmp_aot_dir):
    # Format v3: a shape/dtype/static change is a different graph — miss.
    args = (jnp.ones((4,)),)
    spec = aot.args_spec(args, {})
    compiled = jax.jit(jnp.cumsum).lower(*args).compile()
    aot.save("spec", compiled, args=spec)
    assert aot.load("spec", args=spec) is not None
    other = aot.args_spec((jnp.ones((5,)),), {})
    assert other != spec
    assert aot.load("spec", args=other) is None
    withstatic = aot.args_spec(args, {"n_steps": 7})
    assert withstatic != spec
    assert aot.load("spec", args=withstatic) is None


def test_args_spec_distinguishes_tree_structure():
    a = aot.args_spec(({"x": jnp.ones(3)},), {})
    b = aot.args_spec((jnp.ones(3),), {})
    c = aot.args_spec(({"x": jnp.ones(3, jnp.int32)},), {})
    assert len({a, b, c}) == 3


def test_source_digest_stable_and_covers_config():
    d1 = aot.source_digest()
    d2 = aot.source_digest()
    assert d1 == d2 and len(d1) == 64
    # config.yaml is part of the digest set (constants are baked into
    # traced graphs at setup time).
    assert any("config.yaml" in g for g in aot._SOURCE_GLOBS)


def test_corrupt_artifact_returns_none(tmp_aot_dir):
    args = (jnp.ones((4,)),)
    compiled = jax.jit(jnp.cumsum).lower(*args).compile()
    path = aot.save("corrupt", compiled)
    with open(path, "wb") as f:
        f.write(b"not a zlib pickle")
    assert aot.load("corrupt") is None


def test_fingerprint_fields():
    fp = aot.fingerprint(key="k", args="a" * 64)
    assert fp["key"] == "k"
    assert fp["jax"] == jax.__version__
    assert fp["args"] == "a" * 64
    assert fp["sources"] == aot.source_digest()
    assert fp["format"] == 3
