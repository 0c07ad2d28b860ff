from .imagecodec import decode_image, encode_image, phash64, psnr
from .webgen import (
    WebConfig,
    generate_pandas,
    generate_spark,
    page_caption,
    page_pixels,
    robots_for,
    seeds_for,
)

__all__ = [
    "WebConfig",
    "decode_image",
    "encode_image",
    "generate_pandas",
    "generate_spark",
    "page_caption",
    "page_pixels",
    "phash64",
    "psnr",
    "robots_for",
    "seeds_for",
]
