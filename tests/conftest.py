"""Test configuration: force the JAX CPU platform with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4 takeaway:
the reference cannot do this; we can)."""

import os

# Must be set before jax is imported anywhere. Hard-override: the outer
# environment may point JAX at a real TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture
def tiny_llama_dir(tmp_path_factory):
    """Create a tiny random-weight HF Llama checkpoint on disk."""
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama")
    make_tiny_llama_checkpoint(str(path))
    return str(path)
