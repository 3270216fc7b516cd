"""spark-submit --py-files deployment: the zip bundle must carry the
trained artifacts AND the loaders must find them when the package is
imported from the zip (north_rule: "run via spark-submit --py-files on
a multi-executor cluster").  The subprocess below has NO filesystem
checkout on its path — its only source of casie_spark is the zip —
so a regression to plain os.path artifact loading fails loudly here
instead of silently degrading a cluster run to the rule fallbacks.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one probe per learned head: loader call -> truthy means the TRAINED
# artifact was found (every loader returns None / an untrained
# fallback when the artifact is absent)
_PROBE = r"""
import json
import casie_spark

checks = {}
# the package must come from the zip, not a checkout
checks["from_zip"] = casie_spark.__file__.split("/casie_spark/")[0].endswith(".zip")

from casie_spark.operators.model_tagger import load_weights
checks["tagger"] = load_weights().trig_trans is not None  # distilled fallback has no transitions

from casie_spark.operators.begin_repair import load_begin_weights
checks["begin_repair"] = load_begin_weights() is not None

from casie_spark.operators.linker import load_linker_weights
checks["linker"] = load_linker_weights() is not None

from casie_spark.operators.roles import load_role_weights
checks["roles"] = load_role_weights() is not None

from casie_spark.operators.realis import load_realis_weights
checks["realis"] = load_realis_weights() is not None

from casie_spark.operators.coref import load_coref_weights
checks["coref"] = load_coref_weights() is not None

print(json.dumps(checks))
"""


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    from casie_spark.deploy import build_pyfiles_zip

    out = tmp_path_factory.mktemp("deploy") / "casie_spark.zip"
    return build_pyfiles_zip(str(out))


def test_zip_carries_code_and_artifacts(bundle):
    with zipfile.ZipFile(bundle) as zf:
        names = set(zf.namelist())
    assert "casie_spark/__init__.py" in names
    assert "casie_spark/pipeline.py" in names
    assert "casie_spark/operators/model_tagger.py" in names
    for art in ("tagger_weights.npz", "begin_weights.npz",
                "linker_weights.npz", "role_weights.npz",
                "realis_weights.npz", "coref_weights.npz"):
        assert f"casie_spark/artifacts/{art}" in names
    assert not any(n.endswith(".pyc") or "__pycache__" in n for n in names)


def test_loaders_resolve_artifacts_from_zip(bundle, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = bundle  # the zip is the ONLY package source
    r = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True,
        env=env, cwd=str(tmp_path), timeout=120,
    )
    assert r.returncode == 0, r.stderr
    checks = json.loads(r.stdout.strip().splitlines()[-1])
    assert checks and all(checks.values()), checks


def test_resolve_artifact_passthrough(tmp_path):
    """Real files and explicit non-package paths are returned verbatim
    (training probes rely on a missing explicit path staying missing)."""
    from casie_spark.deploy import resolve_artifact
    from casie_spark.operators.model_tagger import ARTIFACT_PATH

    assert resolve_artifact(ARTIFACT_PATH) == ARTIFACT_PATH  # exists on disk
    custom = str(tmp_path / "nope.npz")
    assert resolve_artifact(custom) == custom  # explicit override, untouched


_SUBMIT_DRIVER = r"""
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("casie-submit-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
import casie_spark

# the package must resolve from the --py-files zip, not a checkout
assert casie_spark.__file__.split("/casie_spark/")[0].endswith(".zip"), \
    casie_spark.__file__

from casie_spark.pipeline import run_pipeline
from casie_spark.sources.documents import synth_documents

docs = synth_documents(spark, 60)
n = run_pipeline(docs, mode="model").count()
print("TRIPLES=" + str(n))
spark.stop()
"""


def test_spark_submit_pyfiles_end_to_end(bundle, tmp_path):
    """The north-rule invocation, literally: ``spark-submit --py-files
    casie_spark.zip driver.py`` with NO checkout on the path — the zip
    is the only package source for the driver AND the executors (the
    pipeline's mapInPandas/pandas_udf stages import casie_spark inside
    executor workers).  mode=model exercises the broadcast-weight
    loaders through the zip-safe resolve_artifact path under a real
    submit, end to end to triples."""
    import shutil

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on this host")
    driver = tmp_path / "submit_driver.py"
    driver.write_text(_SUBMIT_DRIVER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [spark_submit, "--master", "local[2]", "--driver-memory", "4g",
         "--py-files", bundle, str(driver)],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("TRIPLES=")]
    assert lines, r.stdout[-2000:]
    assert int(lines[0].split("=", 1)[1]) > 0
