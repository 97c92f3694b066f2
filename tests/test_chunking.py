"""Chunk-plan golden vectors from the reference test suite."""

from rasters_rs_spark.plans.chunking import ChunkPlan, chunk_plan_rows, mod_ceil


def test_mod_ceil():
    assert mod_ceil(10, 2) == 10
    assert mod_ceil(9, 2) == 10
    assert mod_ceil(0, 7) == 0
    assert mod_ceil(1, 7) == 7


def test_golden_simple():
    # reference src/chunking.rs:143-152
    plan = ChunkPlan(32, 20).add_block_size(2).with_padding(7).with_end(10)
    assert plan.windows() == [(0, 16), (2, 15)]


def test_par_iter_config():
    # reference src/chunking/par_iters.rs:31-51 — the parallel iterator
    # config; here we assert full coverage + structural invariants, the
    # Spark analogue of par == seq is determinism of the plan itself.
    plan = (
        ChunkPlan(1024, 1024)
        .add_block_size(7)
        .with_min_data_size(0x1000)
        .with_padding(3)
        .with_start(13)
        .with_end(999)
    )
    rows = list(plan.chunks())
    assert len(rows) == len(plan)
    # data ranges tile [start, end) without gaps or overlaps
    assert rows[0][1] == 13
    for (a, b) in zip(rows, rows[1:]):
        assert a[2] == b[1]
    assert rows[-1][2] >= 999 - 3  # last data_end is load-clamped
    for (_, ds, de, ls, le) in rows:
        assert ls == ds - 3
        assert le >= de  # trailing padding present unless clamped
        assert 0 <= ls and le <= 1024


def test_single_chunk_when_range_small():
    plan = ChunkPlan(10, 100).with_min_data_height(64).with_end(5)
    rows = list(plan.chunks())
    assert len(rows) == 1
    (_, ds, de, ls, le) = rows[0]
    assert ds == 0 and ls == 0
    assert de == 5


def test_empty_when_start_ge_end():
    plan = ChunkPlan(4, 10).with_start(8).with_end(3)
    assert list(plan.chunks()) == []
    assert len(plan) == 0


def test_block_alignment_of_interior_chunks():
    plan = ChunkPlan(100, 1000).add_block_size(16).with_min_data_height(50)
    rows = list(plan.chunks())
    # data_height is rounded up to a block multiple
    assert plan.data_height == 64
    # every interior boundary lands on a block boundary
    for (_, _, de, _, le) in rows[:-1]:
        assert le % 16 == 0


def test_chunk_plan_rows_shape():
    rows = chunk_plan_rows("img_0", 512, 512, min_data_size=0x10000)
    # 0x10000 / 512 = 128 rows per chunk -> 4 chunks
    assert len(rows) == 4
    assert rows[0][:2] == ("img_0", 0)
