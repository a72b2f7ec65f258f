"""CLI parity with the reference's two entry points: `index` (the
IndexingLauncher batch build) and `probe` (the crawl-time dedup pass as a
batch job), end-to-end through the pluggable source registry."""

from __future__ import annotations

from deduplicator_spark.cli import main

LOG_LINES = [
    # two captures of the same payload at different urls (digest dup)
    "2013-04-23T13:07:38.488Z   200       2446 "
    "http://www.example.is/img/a.png LLEE http://www.example.is/ "
    "image/png #042 20130423130738140+56 sha1:DIGESTAAA - - -",
    "2013-04-23T14:07:38.488Z   200       2446 "
    "http://www.example.is/img/b.png LLEE http://www.example.is/ "
    "image/png #042 20130423140738140+56 sha1:DIGESTAAA - - -",
    # a text/html capture: blacklisted by the mime gate
    "2013-04-23T13:07:39.000Z   200       1000 "
    "http://www.example.is/page.html LLEE http://www.example.is/ "
    "text/html #042 20130423130739000+10 sha1:DIGESTBBB - - -",
    # failed fetch: dropped at parse (F2)
    "2013-04-23T13:07:41.000Z    -2          - "
    "http://www.example.is/broken.png LLEE http://www.example.is/ "
    "no-type #044 - sha1:X - - -",
]


def test_cli_index_then_probe(spark, tmp_path):
    log = tmp_path / "crawl.log"
    log.write_text("\n".join(LOG_LINES) + "\n")
    idx_out = str(tmp_path / "idx")

    rc = main(["--cores", "8", "index", "--source", "crawl_log",
               "--input", str(log), "--output", idx_out])
    assert rc == 0
    index = spark.read.parquet(f"{idx_out}/index")
    rows = {r["url"]: r for r in index.collect()}
    # both image captures indexed under distinct (url, digest) keys;
    # text/html gated out
    assert set(rows) == {"http://www.example.is/img/a.png",
                        "http://www.example.is/img/b.png"}
    assert rows["http://www.example.is/img/a.png"]["url_canon"] \
        == "http://example.is/img/a.png"  # P1 applied
    c = spark.read.parquet(f"{idx_out}/counters").first()
    assert c["handled"] == 3 and c["skipped_mime"] == 1 and c["indexed"] == 2

    # probe: a NEW capture of the same payload at a third url -> digest dup
    from deduplicator_spark.plans.index_build import normalize_captures
    from deduplicator_spark.sources.crawl_log import read_crawl_log

    probe_line = (
        "2013-04-24T09:00:00.000Z   200       2446 "
        "http://mirror.example.is/copy.png LLEE http://mirror.example.is/ "
        "image/png #042 20130424090000000+56 sha1:DIGESTAAA - - -"
    )
    plog = tmp_path / "probe.log"
    plog.write_text(probe_line + "\n")
    caps = str(tmp_path / "captures")
    normalize_captures(read_crawl_log(spark, str(plog))) \
        .write.mode("overwrite").parquet(caps)

    out = str(tmp_path / "probe_out")
    rc = main(["--cores", "8", "probe", "--source", "parquet",
               "--captures", caps, "--index", f"{idx_out}/index",
               "--strategy", "DIGEST_ANY", "--output", out])
    assert rc == 0
    v = spark.read.parquet(f"{out}/verdicts").collect()
    assert len(v) == 1
    r = v[0]
    assert r["verdict"] == "duplicate" and r["dup_class"] == "digest_only"
    # K3 lineage points at the LATEST index entry (last-wins order)
    assert r["refers_to_uri"] == "http://www.example.is/img/b.png"
    assert r["annotation"] == "duplicate:digest,Revisit:IdenticalPayloadDigest"
    assert '"RevisitRefersToURI":"http://www.example.is/img/b.png"' in r["extra_json"]
