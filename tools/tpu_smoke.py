"""On-hardware validation sweep — thin wrapper over the pytest suite.

The compiled-on-silicon checks now live in ``tests_tpu/`` as first-class
pytest tests (``python -m pytest -m tpu tests_tpu``), so CI and humans run
the same gate.  This wrapper remains for muscle memory / older docs.
"""

import os
import subprocess
import sys

if __name__ == "__main__":
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.exit(
        subprocess.call(
            [sys.executable, "-m", "pytest", "-m", "tpu", "-v",
             os.path.join(root, "tests_tpu")]
        )
    )
