"""Launch-contract test: the north_rule's deployment mechanism is
``spark-submit --py-files`` (BASELINE.json north_rule) — this runs a REAL
``spark-submit`` subprocess with ``valor_spark`` shipped ONLY as the
``build_pyfiles_zip`` zip (PYTHONPATH scrubbed from the environment), and
the job forces a worker-side module import by running a mapInArrow operator
(``audio_profile``) plus the rule algebra.  If the zip is incomplete or the
package relies on repo-relative paths at import time, this test fails."""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    import sys
    import numpy as np
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName("valor-submit-smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # driver-side import comes from the --py-files zip too
    import valor_spark as V
    from valor_spark.operators.audio import audio_profile
    from valor_spark.plans.engine import validate

    loud = np.full(64, 32767, dtype="<i2").tobytes()
    quiet = np.zeros(64, dtype="<i2").tobytes()
    df = spark.createDataFrame(
        [("L", loud, "pcm_s16le"), ("Q", quiet, "pcm_s16le")],
        "clip_id string, bytes binary, codec string",
    )
    # mapInArrow => executors must import valor_spark from the shipped zip
    prof = audio_profile(df)
    EA = V.EArray()
    res = validate(
        prof,
        {"clipped": V.fail_if(
            ["Clipped"], lambda r: r.getField("n_clipped") > 0, EA
        )},
        key_cols=["clip_id"],
    )
    rows = sorted(
        (r["clip_id"], r["error"]) for r in res.violations().collect()
    )
    assert rows == [("L", "Clipped")], rows
    print("SUBMIT_SMOKE_OK", rows)
    spark.stop()
    """
)


def test_spark_submit_pyfiles_zip(tmp_path):
    from valor_spark.utils import build_pyfiles_zip

    zip_path = build_pyfiles_zip(str(tmp_path / "valor_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the zip must be the ONLY import path
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        env[var] = "1"

    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--py-files", zip_path,
            str(job),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # no accidental repo-cwd imports either
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "SUBMIT_SMOKE_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
