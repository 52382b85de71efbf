"""Test configuration.

Multi-chip logic is tested on a virtual 8-device CPU mesh (the analogue of the
reference's absent multi-node story, SURVEY.md §4): JAX_PLATFORMS=cpu with
xla_force_host_platform_device_count=8 MUST be set before jax initializes.
Pallas kernels run in interpreter mode on CPU (ops.pallas_utils.interpret_mode).

Fixture pattern follows the reference (tests/conftest.py:9-49): an autouse
fixture clears the Settings lru_cache; ``temp_root`` provides an isolated
VOITTA_ROOT_PATH/VOITTA_DB_PATH per test.
"""

import os

# Force CPU even when the ambient environment selects a TPU platform (axon).
# jax may already be imported by sitecustomize, so set the config directly too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# With EMBEDDING_MODEL_PATH unset, Settings auto-serves the repo-committed
# retrieval checkpoint (config.py _default_ckpt_path): 384-d MiniLM geometry
# and the bench-tuned sparse weight. Tests pin the explicit random-init
# opt-out so store geometry (768-d) and fusion-weight assumptions stay
# stable; the auto-serving path has its own tests
# (tests/test_serving_checkpoint.py).
os.environ["EMBEDDING_MODEL_PATH"] = ""

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def clear_settings_cache():
    from voitta_rag_tpu.config import get_settings

    get_settings.cache_clear()
    yield
    get_settings.cache_clear()


@pytest.fixture
def temp_root(tmp_path, monkeypatch):
    root = tmp_path / "data"
    root.mkdir()
    monkeypatch.setenv("VOITTA_ROOT_PATH", str(root))
    monkeypatch.setenv("VOITTA_DB_PATH", str(tmp_path / "voitta.db"))
    monkeypatch.setenv("VOITTA_INDEX_DIR", str(tmp_path / "index"))
    from voitta_rag_tpu.config import get_settings

    get_settings.cache_clear()
    return root
