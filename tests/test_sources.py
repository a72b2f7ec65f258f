"""Source operators: crawl.log parser (S3) and WARC scan (S1/S2).

Golden-line cases mirror the reference's CrawlLogIteratorTest
(deduplicator-indexer/src/test/java/.../CrawlLogIteratorTest.java:25-64):
valid line -> parsed with status 200 and the sha1: digest preserved verbatim;
truncated/short lines -> dropped; failed fetches (status <= 0) -> dropped.
"""

from __future__ import annotations

import gzip

VALID_LINE = (
    "2013-04-23T13:07:38.488Z   200       2446 "
    "http://www.example.is/img/first.png LLEE http://www.example.is/ "
    "image/png #042 20130423130738140+56 sha1:AD5BDIVID5RCJZ2FGYRZQSZ2U26W5KFA "
    "- duplicate:digest,Revisit:IdenticalPayloadDigest "
    '{"RevisitProfile":"uri:profile","RevisitRefersToURI":"http://www.example.is/img/zero.png",'
    '"RevisitRefersToDate":"2013-01-01T00:00:00Z"}'
)
NO_EXTRA_LINE = (
    "2013-04-23T13:07:40.641Z   200       1954 "
    "http://www.example.is/img/second.png LLEE http://www.example.is/ "
    "image/png #043 20130423130740556+23 sha1:SCEMRFCTC2RALJC6OBN2KO32WAKBBN5E - -"
)
FAILED_LINE = (
    "2013-04-23T13:07:41.000Z    -2          - "
    "http://www.example.is/img/broken.png LLEE http://www.example.is/ "
    "no-type #044 - - - -"
)
TRUNCATED_LINE = "2013-04-23T13:07:38.488Z 200 2446"


def test_crawl_log_golden_lines(spark, tmp_path):
    from deduplicator_spark.sources.crawl_log import read_crawl_log

    log = tmp_path / "crawl.log"
    log.write_text("\n".join([VALID_LINE, NO_EXTRA_LINE, FAILED_LINE, TRUNCATED_LINE]) + "\n")
    rows = {r["url"]: r for r in read_crawl_log(spark, str(log)).collect()}

    assert set(rows) == {
        "http://www.example.is/img/first.png",
        "http://www.example.is/img/second.png",
    }  # failed + truncated dropped (F2/F8)

    first = rows["http://www.example.is/img/first.png"]
    assert first["status"] == 200
    assert first["bytes_len"] == 2446
    assert first["digest"] == "sha1:AD5BDIVID5RCJZ2FGYRZQSZ2U26W5KFA"  # verbatim
    assert first["digest_stripped"] == "AD5BDIVID5RCJZ2FGYRZQSZ2U26W5KFA"
    assert first["mime"] == "image/png"
    assert str(first["ts"]).startswith("2013-04-23 13:07:38")  # P3 reformat
    assert first["revisit"] is True  # P6 annotation regex
    assert first["original_url"] == "http://www.example.is/img/zero.png"  # P5 JSON
    assert first["revisit_profile"] == "uri:profile"

    second = rows["http://www.example.is/img/second.png"]
    assert second["revisit"] is False
    assert second["original_url"] is None


def _warc_record(wtype: str, url: str, body: bytes, extra: dict[str, str]) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {wtype}", f"WARC-Target-URI: {url}",
            "WARC-Date: 2013-04-23T13:07:38Z",
            f"WARC-Record-ID: <urn:uuid:{wtype}-{abs(hash(url)) % 10**8}>",
            f"Content-Length: {len(body)}"]
    head += [f"{k}: {v}" for k, v in extra.items()]
    return ("\r\n".join(head) + "\r\n\r\n").encode() + body + b"\r\n\r\n"


def _mini_warc() -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n"
            b'ETag: "abc123"\r\n\r\nPNGBYTES')
    return b"".join([
        _warc_record("warcinfo", "", b"software: test", {}),
        _warc_record("response", "http://example.is/a.png", http,
                     {"WARC-Payload-Digest": "sha1:AAA"}),
        _warc_record("revisit", "http://example.is/b.png", b"",
                     {"WARC-Payload-Digest": "sha1:AAA",
                      "WARC-Profile": "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
                      "WARC-Refers-To-Target-URI": "http://example.is/a.png",
                      "WARC-Refers-To-Date": "2013-01-01T00:00:00Z"}),
        _warc_record("metadata", "http://example.is/a.png", b"ignored", {}),
        _warc_record("response", "dns:example.is", b"1.2.3.4", {}),  # non-http: dropped
    ])


def test_warc_scan(spark, tmp_path):
    from deduplicator_spark.sources.warc import scan_warc_dir

    sub = tmp_path / "warcs" / "sub"
    sub.mkdir(parents=True)
    (tmp_path / "warcs" / "one.warc").write_bytes(_mini_warc())
    (sub / "two.warc.gz").write_bytes(gzip.compress(_mini_warc()))
    (tmp_path / "warcs" / "ignored.txt").write_bytes(b"not a warc")

    df = scan_warc_dir(spark, str(tmp_path / "warcs"))
    rows = df.collect()
    # 2 usable records per file x 2 files; warcinfo/metadata/dns dropped
    assert len(rows) == 4
    by_key = {(r["path"].split("/")[-1], r["url"]): r for r in rows}
    resp = by_key[("one.warc", "http://example.is/a.png")]
    assert resp["status"] == 200
    assert resp["mime"] == "image/png"
    assert resp["etag"] == "abc123"
    assert resp["digest"] == "sha1:AAA"
    assert resp["revisit"] is False

    rev = by_key[("two.warc.gz", "http://example.is/b.png")]
    assert rev["revisit"] is True
    assert rev["original_url"] == "http://example.is/a.png"
    assert rev["original_ts"] == "2013-01-01T00:00:00Z"
    assert rev["etag"] is None  # P8: non-not-modified revisit -> etag nulled
