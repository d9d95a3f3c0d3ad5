"""Level-table coverage: every strategy class compiles + decodes.

Split out of test_api.py: these are the heaviest compile accumulations in
the suite (one staged-pipeline compile per level class), and the XLA:CPU
LLVM crash threshold is per-process — give them their own xdist worker.
"""

import pytest
import zstandard

from tpu_zstd.api.config import CompressionConfig
from tpu_zstd.api.manager import ExecutionPath, Manager


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


@pytest.mark.parametrize("level", (19, 22))
def test_levels_decode_optimal(level, dctx):
    _level_size(level, dctx)


def test_level22_not_worse_than_level1(dctx):
    assert _level_size(22, dctx) <= _level_size(1, dctx)




def test_lazy_levels_decode(dctx):
    data = b"abcabcabcabcxyzxyzabcabc" * 400
    cfg = CompressionConfig.from_level(7)  # LAZY2 strategy
    cfg.block_size = 4096
    cfg.hash_log = 13
    with Manager(config=cfg, execution_path=ExecutionPath.TPU_BATCH) as m:
        c = m.compress(data)
    assert dctx.decompress(c, max_output_size=len(data)) == data
