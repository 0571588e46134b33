"""Test configuration: force the JAX CPU platform with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4 takeaway:
the reference cannot do this; we can).

This environment pre-registers a real-TPU ("axon") PJRT backend from a
sitecustomize hook at interpreter boot, *before* conftest runs — so plain
JAX_PLATFORMS env vars are too late. We force the platform through
jax.config and drop the axon backend factory before any backend client is
instantiated.
"""

import os

# XLA_FLAGS is read at backend-client creation (not jax import), so this
# still applies even though sitecustomize already imported jax.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:  # pragma: no cover - jax internals moved
    pass

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU platform; got " + jax.default_backend())

import pytest  # noqa: E402


@pytest.fixture
def tiny_llama_dir(tmp_path_factory):
    """Create a tiny random-weight HF Llama checkpoint on disk."""
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama")
    make_tiny_llama_checkpoint(str(path))
    return str(path)
