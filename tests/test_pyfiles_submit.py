"""Ship-shape evidence: the engine runs under `spark-submit --py-files
<zip>` with no install step — the north rule's deployment contract."""
import json
import os
import shutil
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    import json, sys, tempfile
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("pyfiles_smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    from crawl4ai_spark.frontier.bfs import CrawlConfig, run_crawl
    from crawl4ai_spark.frontier.store import WaveStore
    from crawl4ai_spark.synth.pages import generate_site, write_site_parquet

    site_dir = tempfile.mkdtemp()
    write_site_parquet(generate_site(n_hosts=2, cats=2, prods=3, seed=11), site_dir)
    pages = spark.read.parquet(site_dir + "/pages.parquet")
    seeds = pages.select("url").limit(2)
    store_dir = tempfile.mkdtemp() + "/store"
    summary = run_crawl(
        spark, pages, seeds, store_dir,
        CrawlConfig(max_depth=1, use_bloom=True, compact_on_finish=True),
    )
    n = WaveStore(spark, store_dir).read_table("results").count()
    print("SMOKE_RESULT " + json.dumps(
        {"results": n, "attempted": summary["total_attempted"]}))
    spark.stop()
    sys.exit(0)
    """
)


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_pyfiles_zip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "crawl4ai_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY source of the pkg
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[8]",
            "--py-files", zip_path, str(job),
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = next(
        (ln for ln in out.stdout.splitlines() if ln.startswith("SMOKE_RESULT ")),
        None,
    )
    assert line, out.stdout[-2000:]
    payload = json.loads(line[len("SMOKE_RESULT "):])
    assert payload["results"] == payload["attempted"] > 0
