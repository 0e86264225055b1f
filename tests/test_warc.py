"""WARC source contract (sources/warc.py — S1 family, fourth format).

The reader is a from-scratch streaming FileBasedDatasource for the
Common Crawl container (WARC/1.0, ISO 28500); the serializer is the
deterministic fixture builder. Contract pinned here:

- round trip: parquet pages -> WARC shards -> Dataset reproduces every
  non-NULL-html row byte-identically (url, warc_ts, html);
- gz and plain shards parse identically (Ray decompresses by path);
- non-response records (warcinfo) are skipped, a warcinfo-only shard
  yields zero rows;
- blocks stream: a small rows_per_block yields multiple Arrow blocks
  per shard, not one readall table;
- corrupt input fails loudly (truncated record, bad version line).
"""

import glob
import gzip
import os

import pyarrow.parquet as pq
import pytest

from txiac_qc_ray.sources.pages import generate_pages_parquet
from txiac_qc_ray.sources.warc import (WarcDatasource, read_pages_warc,
                                       write_pages_warc)

N = 380  # first null-html edge row at seed 42 is index 358


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("warc_pages"))
    return generate_pages_parquet(d, N, seed=42)


def _expected_rows(pages_dir):
    parts = sorted(glob.glob(os.path.join(pages_dir, "part-*.parquet")))
    t = pq.read_table(parts, columns=["url", "warc_ts", "html"])
    rows = [
        (u, ts, h)
        for u, ts, h in zip(t["url"].to_pylist(), t["warc_ts"].to_pylist(),
                            t["html"].to_pylist())
        if h is not None
    ]
    assert len(rows) < N, "fixture should contain null-html rows"
    return rows


def _read_rows(ds):
    out = ds.to_pandas().sort_values("url", ignore_index=True)
    return list(zip(out["url"], out["warc_ts"].dt.to_pydatetime(),
                    out["html"]))


def test_round_trip_gz(ray_session, pages_dir, tmp_path):
    out = write_pages_warc(pages_dir, str(tmp_path / "warc_gz"),
                           rows_per_shard=17)
    assert len(glob.glob(os.path.join(out, "crawl-*.warc.gz"))) > 1
    got = _read_rows(read_pages_warc(out))
    want = sorted(_expected_rows(pages_dir))
    assert [(u, t, bytes(h)) for u, t, h in got] == want


def test_plain_equals_gz(ray_session, pages_dir, tmp_path):
    gz = write_pages_warc(pages_dir, str(tmp_path / "w_gz"), compress=True)
    plain = write_pages_warc(pages_dir, str(tmp_path / "w_plain"),
                             compress=False)
    assert _read_rows(read_pages_warc(gz)) == _read_rows(
        read_pages_warc(plain))


def test_streams_in_blocks(ray_session, pages_dir, tmp_path):
    out = write_pages_warc(pages_dir, str(tmp_path / "w_blocks"),
                           rows_per_shard=1000)  # one shard
    ds = read_pages_warc(out, rows_per_block=8)
    n_rows = 0
    n_batches = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_batches += 1
        n_rows += b.num_rows
    assert n_rows == len(_expected_rows(pages_dir))
    assert n_batches > 1, "single-shard read must stream multiple blocks"


def test_warcinfo_only_shard_is_empty(ray_session, tmp_path):
    from txiac_qc_ray.sources.warc import _warcinfo_record

    p = tmp_path / "info.warc"
    p.write_bytes(_warcinfo_record(0))
    assert read_pages_warc(str(p)).count() == 0


def test_truncated_record_raises(ray_session, pages_dir, tmp_path):
    src = write_pages_warc(pages_dir, str(tmp_path / "w_ok"),
                           rows_per_shard=1000)
    shard = glob.glob(os.path.join(src, "crawl-*.warc.gz"))[0]
    blob = gzip.open(shard, "rb").read()
    cut = tmp_path / "cut.warc"
    cut.write_bytes(blob[: len(blob) - 40])  # chop mid final record
    with pytest.raises(Exception, match="truncated WARC"):
        read_pages_warc(str(cut)).materialize()


def test_bad_version_line_raises(ray_session, tmp_path):
    p = tmp_path / "bad.warc"
    p.write_bytes(b"HTTP/1.1 200 OK\r\n\r\nnot a warc")
    with pytest.raises(Exception, match="bad WARC version"):
        read_pages_warc(str(p)).materialize()


def test_serializer_is_deterministic(pages_dir, tmp_path):
    a = write_pages_warc(pages_dir, str(tmp_path / "d_a"))
    b = write_pages_warc(pages_dir, str(tmp_path / "d_b"))
    fa = sorted(glob.glob(os.path.join(a, "crawl-*")))
    fb = sorted(glob.glob(os.path.join(b, "crawl-*")))
    assert [open(f, "rb").read() for f in fa] == [
        open(f, "rb").read() for f in fb]


def test_datasource_respects_extension_filter(ray_session, pages_dir,
                                              tmp_path):
    out = write_pages_warc(pages_dir, str(tmp_path / "w_mix"))
    # the cache dir contains a non-warc file (_meta.json): the
    # extension filter must skip it rather than feed it to the parser
    assert os.path.exists(os.path.join(out, "_meta.json"))
    got = _read_rows(read_pages_warc(out))
    assert len(got) == len(_expected_rows(pages_dir))
