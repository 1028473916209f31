"""Streaming surface: batch equivalence + results-table tailing."""

import os

from pyspark.sql import functions as F


def test_windowed_events_stream_equals_batch(spark, tmp_path):
    import shutil

    from crawl4ai_spark.streaming.stream import run_windowed_events_batch_equivalent

    # the streaming file source tails a DIRECTORY of files
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", events_dir / "part-0.parquet")
    streamed, batch = run_windowed_events_batch_equivalent(
        spark, str(events_dir), str(tmp_path / "ckpt")
    )
    assert streamed == batch
    assert len(batch) > 0


def test_results_stream_tails_wave_commits(spark, site_dir, tmp_path):
    """Crawl the fixture site, then tail the results table as a stream —
    the streamed rows must equal the batch read."""
    from crawl4ai_spark.frontier.bfs import CrawlConfig, run_crawl
    from crawl4ai_spark.frontier.store import WaveStore
    from crawl4ai_spark.streaming.stream import results_stream

    store_dir = str(tmp_path / "store_stream")
    pages = spark.read.parquet(os.path.join(site_dir, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(site_dir, "seeds.parquet"))
    run_crawl(spark, pages, seeds, store_dir, CrawlConfig(max_depth=2, links_only=True, use_bloom=False))

    stream = results_stream(spark, store_dir).select("url", "wave", "status")
    query = (
        stream.writeStream.format("memory")
        .queryName("results_tail")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    streamed = {(r.url, r.wave, r.status) for r in spark.sql("SELECT * FROM results_tail").collect()}
    batch = {
        (r.url, r.wave, r.status)
        for r in WaveStore(spark, store_dir).read_table("results").select("url", "wave", "status").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_results_stream_matches_batch_and_hides_staging(spark, site_dir, tmp_path):
    """readStream over the results table must see exactly the committed
    rows (availableNow drain ≡ batch read), and an in-flight staged wave
    must be invisible to both readers until commit renames it in."""
    import os

    from pyspark.sql import functions as F

    from crawl4ai_spark.frontier.bfs import CrawlConfig, run_crawl
    from crawl4ai_spark.frontier.store import WaveStore
    from crawl4ai_spark.streaming.stream import results_stream

    pages = spark.read.parquet(os.path.join(site_dir, "pages.parquet"))
    seeds = spark.read.parquet(os.path.join(site_dir, "seeds.parquet"))
    store_dir = str(tmp_path / "store_stream")
    run_crawl(spark, pages, seeds, store_dir, CrawlConfig(max_depth=1, use_bloom=False))

    store = WaveStore(spark, store_dir)
    batch = store.read_table("results")
    n_committed = batch.count()
    assert n_committed > 0

    # stage an extra wave WITHOUT committing: no reader may see it
    extra = batch.limit(3).withColumn("url", F.concat(F.lit("http://staged.test/"), F.col("url")))
    store.write_table("results", 9999, extra)
    assert store.read_table("results").count() == n_committed

    q = (
        results_stream(spark, store_dir)
        .writeStream.format("memory")
        .queryName("results_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = spark.sql("SELECT url, wave, status FROM results_stream_test")
    assert streamed.count() == n_committed
    assert streamed.where(F.col("url").startswith("http://staged.test/")).count() == 0
    want = {(r.url, r.status) for r in batch.select("url", "status").collect()}
    got = {(r.url, r.status) for r in streamed.select("url", "status").collect()}
    assert got == want

    # commit the staged wave: the restarted stream now includes it
    store.commit(9999)
    q2 = (
        results_stream(spark, store_dir)
        .writeStream.format("memory")
        .queryName("results_stream_test2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert spark.sql("SELECT * FROM results_stream_test2").count() == n_committed + 3
