"""Regenerate tests/golden/goldens.json (render PNG sha256 pins).

Run after an intentional change to render/codec semantics:
    rm tests/golden/goldens.json && python -m pytest tests/test_queries.py -q
(the golden test writes the file on first run), or execute this module:
    python tests/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import test_queries as tq

    if os.path.exists(tq.GOLDEN):
        os.remove(tq.GOLDEN)
    import subprocess

    subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_queries.py::test_render_golden_hashes", "-q"],
        check=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    print(f"regenerated {tq.GOLDEN}")


if __name__ == "__main__":
    main()
