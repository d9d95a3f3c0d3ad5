"""Level-table coverage: every strategy class compiles + decodes.

Split out of test_api.py: these are the heaviest compile accumulations in
the suite (one staged-pipeline compile per level class), and the XLA:CPU
LLVM crash threshold is per-process — give them their own xdist worker.
"""

import os

import pytest
import zstandard

from tpu_zstd.api.config import CompressionConfig
from tpu_zstd.api.manager import ExecutionPath, Manager

# Full-depth optimal levels (19/22) compile 5-10 minute XLA:CPU graphs
# (depth-48/96 unrolled compare chains x 16 carried words) — gated exactly
# like the reference gates its heavy set (CUDA_ZSTD_RUN_HEAVY_TESTS,
# reference tests/test_correctness.cu:223). The default suite still covers
# the optimal-parse/min_match-3 CODE PATH via test_optimal_level_quick.
heavy = pytest.mark.skipif(
    not os.environ.get("TPU_ZSTD_RUN_HEAVY_TESTS"),
    reason="full-depth L19/L22 compile is minutes on XLA:CPU; set TPU_ZSTD_RUN_HEAVY_TESTS=1",
)


@pytest.fixture()
def dctx():
    return zstandard.ZstdDecompressor()


def _level_size(level, dctx):
    data = b"level sweep data - the quick brown fox " * 500
    cfg = CompressionConfig.from_level(level)
    cfg.block_size = 16384
    cfg.hash_log = min(cfg.hash_log, 14)
    with Manager(config=cfg, execution_path=ExecutionPath.TPU_BATCH) as m:
        c = m.compress(data)
    assert dctx.decompress(c, max_output_size=len(data)) == data, f"L{level}"
    return len(c)


# One test per level class (was a single 7-level loop that accumulated seven
# staged-pipeline compiles in one SIGALRM window and could not finish on the
# 4-core CI box; split, each test is bounded on its own and the persistent
# compile cache makes reruns cheap).
@pytest.mark.parametrize("level", (1, 3, 5, 9, 12))
def test_levels_decode_fast(level, dctx):
    _level_size(level, dctx)


@heavy
@pytest.mark.parametrize("level", (19, 22))
def test_levels_decode_optimal(level, dctx):
    _level_size(level, dctx)


@heavy
def test_level22_not_worse_than_level1(dctx):
    assert _level_size(22, dctx) <= _level_size(1, dctx)


def test_optimal_level_quick(dctx):
    """BTOPT strategy + min_match 3 at a CI-sized graph: the same optimal
    code path as L19 (two-pass measured-cost DP, mm-3 hash/extraction) with
    the search knobs trimmed so the compile stays in seconds."""
    data = b"level sweep data - the quick brown fox " * 500
    cfg = CompressionConfig.from_level(19)
    cfg.block_size = 16384
    cfg.hash_log = 13
    cfg.search_depth = 6
    cfg.compare_cap = 16
    with Manager(config=cfg, execution_path=ExecutionPath.TPU_BATCH) as m:
        c = m.compress(data)
    assert dctx.decompress(c, max_output_size=len(data)) == data




def test_lazy_levels_decode(dctx):
    data = b"abcabcabcabcxyzxyzabcabc" * 400
    cfg = CompressionConfig.from_level(7)  # LAZY2 strategy
    cfg.block_size = 4096
    cfg.hash_log = 13
    with Manager(config=cfg, execution_path=ExecutionPath.TPU_BATCH) as m:
        c = m.compress(data)
    assert dctx.decompress(c, max_output_size=len(data)) == data
