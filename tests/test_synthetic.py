import numpy as np
import pytest

from cs3103_gocrawler_spark.functions.urlfuncs import canonicalize_url, sha1_64
from cs3103_gocrawler_spark.synthetic.imagecodec import (
    decode_image,
    encode_image,
    phash64,
    psnr,
)
from cs3103_gocrawler_spark.synthetic.webgen import (
    WebConfig,
    generate_pandas,
    page_caption,
    page_pixels,
    page_resp_ms,
    pages_per_host,
)


def test_png_roundtrip_lossless():
    px = np.random.default_rng(1).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert (decode_image(encode_image(px, "png"), "png") == px).all()


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_psnr_gate(fmt):
    px = np.random.default_rng(2).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_image(encode_image(px, fmt), fmt)
    p = psnr(px, dec)
    assert 40.0 <= p < float("inf")  # lossy but above the gate


def test_phash_deterministic_and_sensitive():
    px = np.random.default_rng(3).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert phash64(px) == phash64(px.copy())
    other = px.copy()
    other[:8] = 255 - other[:8]
    assert phash64(px) != phash64(other)


def test_generator_deterministic_and_order_independent():
    cfg = WebConfig(seed=42, n_hosts=3, n_pages=40)
    p1, e1 = generate_pandas(cfg)
    p2, e2 = generate_pandas(cfg)
    assert p1.drop(columns=["bytes"]).equals(p2.drop(columns=["bytes"]))
    assert all(a == b for a, b in zip(p1["bytes"], p2["bytes"]))
    assert e1.equals(e2)
    # per-page attributes depend only on (seed, url), not on cfg shape
    url = p1["image_id"].iloc[5]
    assert page_caption(42, url) == p1["caption"].iloc[5]
    assert (page_pixels(42, url, 16, 16) == page_pixels(42, url, 16, 16)).all()
    assert 10 <= page_resp_ms(42, url) <= 500


def test_power_law_host_skew():
    cfg = WebConfig(n_hosts=10, n_pages=1000)
    pph = pages_per_host(cfg)
    assert pph.sum() == 1000
    assert pph[0] > 3 * pph[-1]  # genuinely skewed


def test_canonicalize():
    assert canonicalize_url("HTTP://H0.Test/p/1#frag") == "http://h0.test/p/1"
    assert canonicalize_url("http://h0.test") == "http://h0.test/"
    assert canonicalize_url("http://h0.test:80/x") == "http://h0.test/x"
    assert canonicalize_url("http://h0.test:8080/x") == "http://h0.test:8080/x"
    assert canonicalize_url("http://h0.test/a?q=1") == "http://h0.test/a?q=1"
    assert canonicalize_url("/rel", base="http://h0.test/p/1") == "http://h0.test/rel"
    assert canonicalize_url("mailto:x@y.z") is None
    assert canonicalize_url("ftp://h0.test/x") is None
    assert canonicalize_url("not a url") is None
    assert isinstance(sha1_64("http://h0.test/"), int)
