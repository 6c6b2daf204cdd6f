"""On-silicon test configuration.

Unlike ``tests/`` (which pins JAX to CPU and interprets Pallas), this suite
compiles every kernel on the real chip.  All tests are marked ``tpu`` and the
whole directory is skipped when no TPU backend is available.

Run: ``python -m pytest -m tpu tests_tpu`` (~15 min cold incl. compiles).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend", allow_module_level=False)
