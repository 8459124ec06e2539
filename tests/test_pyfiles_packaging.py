"""spark-submit --py-files packaging: the zip built by tools/make_pyfiles.py
must contain the complete package, importable via zipimport alone (what
executors do). A real `spark-submit --py-files` end-to-end run of
tools/submit_example.py is part of the verify recipe (documented in
README); this test keeps the cheap invariant in the suite."""

import os
import subprocess
import sys


def test_pyfiles_zip_is_complete_and_zipimportable(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "fx.zip"
    subprocess.run(
        [sys.executable, os.path.join(root, "tools", "make_pyfiles.py"),
         "--out", str(out)],
        check=True, capture_output=True,
    )
    # import the package from the zip in a clean interpreter (no repo on path)
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import feature_extractor_spark as fx; "
        "from feature_extractor_spark.operators.asof import asof_join; "
        "from feature_extractor_spark.operators.fused import windowed_encode; "
        "from feature_extractor_spark.encoder.plugins import ENCODERS, DECODERS; "
        "from feature_extractor_spark.plans.model_search import incremental_latent_search; "
        "assert not fx.__file__.startswith(%r), fx.__file__; "
        "print('ZIPIMPORT_OK', len(ENCODERS), len(DECODERS))"
    ) % (str(out), root)
    r = subprocess.run(
        [sys.executable, "-c", probe],
        check=True, capture_output=True, text=True,
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "ZIPIMPORT_OK" in r.stdout


def test_pyfiles_zip_is_deterministic(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a, b = tmp_path / "a.zip", tmp_path / "b.zip"
    for out in (a, b):
        subprocess.run(
            [sys.executable, os.path.join(root, "tools", "make_pyfiles.py"),
             "--out", str(out)],
            check=True, capture_output=True,
        )
    assert a.read_bytes() == b.read_bytes()
