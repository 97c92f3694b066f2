"""Data-mask operator (reference raster-mask).

Rule (raster-mask/clipping.rs:6-31):
- 3-band rasters: a pixel is data unless ALL of R,G,B equal no_val;
- otherwise: the LAST band decides, data iff !isnan(val) && val != no_val;
- output is uint8 255 (data) / 0 (no-data), same width/height.

Multi-band blocks are stored band-major: bytes decode to
(bands*h, w) and band k is rows [k*h, (k+1)*h).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import codecs


def mask_block(block: np.ndarray, bands: int, no_val: float) -> np.ndarray:
    h = block.shape[0] // bands
    if bands == 3:
        r, g, b = (block[k * h:(k + 1) * h] for k in range(3))
        is_data = ~((r == no_val) & (g == no_val) & (b == no_val))
    else:
        last = block[(bands - 1) * h: bands * h]
        is_data = ~np.isnan(last) & (last != no_val)
    return np.where(is_data, np.uint8(255), np.uint8(0)).astype(np.uint8)


def mask(images: DataFrame) -> DataFrame:
    """uint8 mask raster per image; bytes are raw uint8 row-major."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                bands = int(getattr(row, "bands", 1))
                block = codecs.decode_block(row.bytes, row.h * bands, row.w, row.fmt)
                m = mask_block(block, bands, row.no_val)
                out.append((row.image_id, m.tobytes(), row.w, row.h, "u8",
                            list(row.gt), row.crs))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h",
                                             "fmt", "gt", "crs"])

    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "gt array<double>, crs string")
    return images.mapInPandas(gen, schema=schema)
