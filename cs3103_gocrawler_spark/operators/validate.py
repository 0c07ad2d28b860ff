"""U4/X5 — image payload decode + validation (BASELINE.json input_hint).

Per-row invariants, all recomputed inside one Arrow batch pass
(``mapInPandas``) with no side tables — ground truth regenerates from
(seed, url) via webgen:

* decode ``bytes`` per ``fmt``; lossless (png) must equal the reference
  pixels exactly; lossy must be allclose with PSNR ≥ 40 dB
* ``phash`` recompute equality (imagecodec.phash64 over decoded pixels for
  lossless / over reference pixels for the stored-hash check)
* ``caption`` byte-equality vs the regenerated caption

Output is a compact per-URL validation record — the image bytes never leave
the batch (they are projected away before any shuffle, SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..synthetic.imagecodec import decode_image, phash64, psnr
from ..synthetic.webgen import page_caption, page_pixels

VALIDATION_SCHEMA = (
    "url string, fmt string, decode_ok boolean, psnr_db double, "
    "phash_ok boolean, caption_ok boolean, valid boolean"
)

PSNR_GATE_DB = 40.0


def validate_payloads(fetched_pages: DataFrame, gen_seed: int = 42) -> DataFrame:
    """``fetched_pages`` needs (image_id, bytes, w, h, fmt, caption, phash)."""

    def check(batches):
        for pdf in batches:
            rows = {k: [] for k in
                    ("url", "fmt", "decode_ok", "psnr_db", "phash_ok", "caption_ok", "valid")}
            for r in pdf.itertuples():
                url, fmt = r.image_id, r.fmt
                ref_px = page_pixels(gen_seed, url, int(r.w), int(r.h))
                decode_ok, p_db = False, 0.0
                try:
                    px = decode_image(bytes(r.bytes), fmt)
                    p_db = psnr(ref_px, px)
                    decode_ok = (px == ref_px).all() if fmt == "png" else p_db >= PSNR_GATE_DB
                except Exception:
                    px = None
                phash_ok = px is not None and phash64(ref_px) == int(r.phash)
                caption_ok = page_caption(gen_seed, url) == r.caption
                rows["url"].append(url)
                rows["fmt"].append(fmt)
                rows["decode_ok"].append(bool(decode_ok))
                rows["psnr_db"].append(float(min(p_db, 1e6)))
                rows["phash_ok"].append(bool(phash_ok))
                rows["caption_ok"].append(bool(caption_ok))
                rows["valid"].append(bool(decode_ok and phash_ok and caption_ok))
            import pandas as pd
            yield pd.DataFrame(rows)

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return fetched_pages.select(*cols).mapInPandas(check, schema=VALIDATION_SCHEMA)
