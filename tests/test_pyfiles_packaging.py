"""spark-submit --py-files packaging (north star launch mode).

The full end-to-end run is tools/submit_flagship.py via a real
spark-submit (documented in README; exercised manually — ~2 min JVM
startup is too heavy for the unit suite).  Here we verify the two
properties the cluster deploy depends on: the artifact is
deterministic, and the package is importable from the zip ALONE
(zipimport, no repo checkout on the executor)."""

import hashlib
import subprocess
import sys

from tools.make_pyfiles import build


def test_zip_is_deterministic(tmp_path):
    a = build(str(tmp_path / "a"))
    b = build(str(tmp_path / "b"))
    ha = hashlib.sha256(open(a, "rb").read()).hexdigest()
    hb = hashlib.sha256(open(b, "rb").read()).hexdigest()
    assert ha == hb


def test_package_imports_from_zip_alone(tmp_path):
    zip_path = build(str(tmp_path))
    code = (
        "import sys\n"
        f"sys.path = [{zip_path!r}] + [p for p in sys.path if 'repo' not in p]\n"
        "import numpy as np\n"
        "from s2_geometry_library_php_spark.s2core.cellid import (\n"
        "    cell_id_from_latlng_degrees, token_from_id)\n"
        "ids = cell_id_from_latlng_degrees(np.array([48.8566]), np.array([2.3522]))\n"
        "print(token_from_id(ids)[0])\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "47e66e1d8f8be23b"
