"""north_rule packaging: the library runs under real spark-submit with
--py-files — imports resolved from the built zip, not the repo tree."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not available")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles_zip

    zip_path = make_pyfiles_zip.build(str(tmp_path / "dist"))
    assert os.path.getsize(zip_path) > 10_000

    # tiny pages table for the submitted job
    from ptt_spider_go_spark.datagen import pages_pandas

    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(
        pages_pandas(boards=("Beauty",), pages_per_board=2, slots_per_page=5)
    ).write.mode("overwrite").parquet(pages_dir)

    # submit from OUTSIDE the repo so the package can only come from
    # the zip (python puts the script's dir on sys.path, so the script
    # must not sit next to the source tree)
    script = str(tmp_path / "submit_crawl.py")
    shutil.copy(os.path.join(REPO, "submit_crawl.py"), script)
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path, script,
         "--pages", pages_dir, "--board", "Beauty",
         "--pages-n", "2", "--push", "0", "--out", out_dir],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "crawl done:" in proc.stdout
    arts = spark.read.parquet(os.path.join(out_dir, "articles"))
    assert arts.count() > 0
    assert spark.read.parquet(os.path.join(out_dir, "metrics")).count() > 0
