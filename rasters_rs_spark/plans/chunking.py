"""Chunk-plan arithmetic: full-width padded strips.

Re-derives the partition-boundary arithmetic of the reference's
ChunkConfig (src/chunking.rs:40-101, src/chunking/builder.rs:4-148,
src/chunking/iters.rs:14-93). The numbers must match the reference
bit-for-bit because they define both read windows and partition keys;
the *execution* is Spark's (each plan row becomes a partition key), so
only the pure integer arithmetic is mirrored here.

Golden vectors: src/chunking.rs:143-152 and src/chunking/par_iters.rs:31-51
(see tests/test_chunking.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace


def mod_ceil(num: int, m: int) -> int:
    """Round ``num`` up to the next multiple of ``m`` (src/chunking.rs:93-101)."""
    rem = num % m
    return num if rem == 0 else num + (m - rem)


@dataclass(frozen=True)
class ChunkPlan:
    """Immutable chunking configuration (builder-style, like the reference)."""

    width: int
    height: int
    block_size: int = 1
    data_height: int = 1
    padding: int = 0
    start: int = 0
    end: int = -1  # sentinel: set to height in __post_init__

    def __post_init__(self):
        if self.width < 1 or self.height < 1:
            raise ValueError("dimensions must both be at least 1")
        if self.end == -1:
            object.__setattr__(self, "end", self.height)

    # -- builder ops (each returns a new plan) ------------------------------

    def add_block_size(self, block_size: int) -> "ChunkPlan":
        if block_size < 1:
            raise ValueError("block_size should be at least 1")
        bs = math.lcm(self.block_size, block_size)
        return replace(self, block_size=bs, data_height=mod_ceil(self.data_height, bs))

    def with_min_data_height(self, min_dh: int) -> "ChunkPlan":
        dh = mod_ceil(max(min_dh, 1), self.block_size)
        return replace(self, data_height=dh)

    def with_min_data_size(self, min_pixels: int) -> "ChunkPlan":
        min_height = (min_pixels + self.width - 1) // self.width
        return self.with_min_data_height(min_height)

    def with_padding(self, padding: int) -> "ChunkPlan":
        return replace(self, padding=padding, start=max(self.start, padding))

    def with_start(self, start: int) -> "ChunkPlan":
        return replace(self, start=max(start, self.padding))

    def with_end(self, end: int) -> "ChunkPlan":
        return replace(self, end=min(end, self.height))

    # -- iteration -----------------------------------------------------------

    def _initial_chunk(self):
        """(count, initial_data_end, initial_load_end); count may be 0."""
        if self.start >= self.end:
            return 0, 0, 0
        data_end = min(self.start + self.data_height, self.end)
        load_end = min(mod_ceil(data_end + self.padding, self.block_size), self.height)
        data_end = max(load_end - self.padding, self.start)
        if data_end > self.end:
            data_end = self.end
            load_end = data_end + self.padding
        dcount = mod_ceil(self.end - data_end, self.data_height) // self.data_height
        lcount = mod_ceil(self.height - load_end, self.data_height) // self.data_height
        return min(dcount, lcount) + 1, data_end, load_end

    def chunks(self):
        """Yield (idx, data_start, data_end, load_start, load_end) rows.

        ``load_*`` includes the symmetric padding; sizes match the
        reference's ChunkWindow (load_start, load_end - load_start).
        """
        count, ide, ile = self._initial_chunk()
        for i in range(count):
            if i == 0:
                ds, de, le = self.start, ide, ile
            elif i < count - 1:
                ds = ide + (i - 1) * self.data_height
                de = ds + self.data_height
                le = de + self.padding
            else:
                ds = ide + (i - 1) * self.data_height
                de = min(ds + self.data_height, self.end)
                le = min(de + self.padding, self.height)
                de = le - self.padding
            yield (i, ds, de, ds - self.padding, le)

    def windows(self):
        """[(load_start, nrows)] exactly as the reference iterator yields."""
        return [(ls, le - ls) for (_, _, _, ls, le) in self.chunks()]

    def __len__(self):
        return self._initial_chunk()[0]


def chunk_plan_rows(image_id: str, width: int, height: int,
                    min_data_size: int = 0x10000, padding: int = 0,
                    block_size: int = 1):
    """Chunk-plan rows for one image, ready to build a plan DataFrame:
    (image_id, chunk_idx, data_start, data_end, load_start, load_end).
    Default min_data_size mirrors the reference CLI default of 64k pixels
    (raster-diff/args.rs:160).
    """
    plan = (
        ChunkPlan(width, height)
        .add_block_size(block_size)
        .with_min_data_size(min_data_size)
        .with_padding(padding)
    )
    return [(image_id, i, ds, de, ls, le) for (i, ds, de, ls, le) in plan.chunks()]
